"""Deterministic synthesis of the canonical engine input: a table of
interleaved text+media documents with geometry (BASELINE.json
`input_hint`):

    doc_id:string
    spans:list<struct<kind:string, text:string, media_ref:string, offset:int32>>
    lon/lat:float64 + geometry:binary (WKB point)

Everything derives from the integer doc index with fixed multipliers
(same scheme as `functions.derive`), so any scale factor regenerates
bit-identically — no stored fixtures, safe retries, resumable runs.

The per-row invariant every operator must preserve is span-sequence
equality: (kind, text, media_ref, offset) in order (SURVEY.md §1.4 —
the analog of ogr2ogr carrying non-geometry fields through untouched).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import derive
from ..geom import wkb

_KINDS = ["text", "image", "audio", "text", "text", "video"]
_WORDS = [
    "survey", "tile", "raster", "vector", "join", "cell", "stream", "batch",
    "arrow", "shuffle", "polygon", "point", "index", "buffer", "zoom", "layer",
]


def make_span_lists(doc_idx: np.ndarray):
    """Deterministic spans per doc index: 1-6 spans, interleaved kinds.

    Returns a pyarrow ListArray of struct<kind,text,media_ref,offset>.
    """
    n_spans = (doc_idx % 6 + 1).astype(np.int64)
    kinds, texts, refs, offsets = [], [], [], []
    list_offsets = np.zeros(len(doc_idx) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=list_offsets[1:])
    for i, d in enumerate(doc_idx):
        off = 0
        for s in range(int(n_spans[i])):
            kind = _KINDS[(d + s) % len(_KINDS)]
            kinds.append(kind)
            if kind == "text":
                w1 = _WORDS[(d * 7 + s * 3) % len(_WORDS)]
                w2 = _WORDS[(d * 13 + s * 5) % len(_WORDS)]
                t = f"{w1} {w2} {d % 100}"
                texts.append(t)
                refs.append("")
            else:
                texts.append("")
                refs.append(f"s3://media/{kind}/{d % 1000:03d}/{d}_{s}.bin")
            offsets.append(off)
            off += len(texts[-1]) or 1
    struct = pa.StructArray.from_arrays(
        [pa.array(kinds), pa.array(texts), pa.array(refs),
         pa.array(np.asarray(offsets, dtype=np.int32))],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(pa.array(list_offsets), struct)


def _docs_batch(batch: pa.Table) -> pa.Table:
    idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = derive.event_lonlat(idx + 1)
    doc_id = pa.array([f"doc-{i:09d}" for i in idx])
    spans = make_span_lists(idx)
    geom = pa.array(wkb.points_to_wkb(lon, lat), type=pa.binary())
    return pa.table({
        "doc_id": doc_id,
        "spans": spans,
        "lon": pa.array(lon),
        "lat": pa.array(lat),
        "geometry": geom,
        "value": pa.array(((idx * 31) % 1000) / 10.0),
    })


def interleaved_docs(n: int, override_num_blocks: int = None) -> ray.data.Dataset:
    """Dataset of n deterministic interleaved documents (streamed — no
    driver-side materialization; blocks generated in parallel)."""
    base = ray.data.range(n, override_num_blocks=override_num_blocks)
    return base.map_batches(_docs_batch, batch_format="pyarrow")


def span_signature(spans_column) -> list:
    """Canonical per-row span signature [(kind, text, media_ref, offset), ...]
    used by tests to assert span-sequence equality end-to-end."""
    out = []
    for row in spans_column:
        row = row.as_py() if hasattr(row, "as_py") else row
        out.append(tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row))
    return out
