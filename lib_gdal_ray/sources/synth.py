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

    Fully vectorized (numpy index math + arrow string kernels).
    Returns a pyarrow ListArray of struct<kind,text,media_ref,offset>.
    """
    import pyarrow.compute as pc

    n_spans = (doc_idx % 6 + 1).astype(np.int64)
    list_offsets = np.zeros(len(doc_idx) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=list_offsets[1:])
    total = int(list_offsets[-1])
    d = np.repeat(doc_idx, n_spans)
    # within-doc span index: global arange minus each doc's start
    s = (np.arange(total, dtype=np.int64)
         - np.repeat(list_offsets[:-1].astype(np.int64), n_spans)) \
        if total else np.empty(0, np.int64)

    kinds_arr = np.asarray(_KINDS)
    words_arr = np.asarray(_WORDS)
    kind = kinds_arr[(d + s) % len(_KINDS)]
    is_text = kind == "text"

    w1 = pa.array(words_arr[(d * 7 + s * 3) % len(_WORDS)])
    w2 = pa.array(words_arr[(d * 13 + s * 5) % len(_WORDS)])
    dmod = pc.cast(pa.array(d % 100), pa.string())
    text_all = pc.binary_join_element_wise(w1, w2, dmod, " ")
    text = pc.if_else(pa.array(is_text), text_all, "")

    pad = pc.utf8_lpad(pc.cast(pa.array(d % 1000), pa.string()), 3, "0")
    dstr = pc.cast(pa.array(d), pa.string())
    sstr = pc.cast(pa.array(s), pa.string())
    ref_all = pc.binary_join_element_wise(
        "s3://media/", pa.array(kind), "/", pad, "/", dstr, "_", sstr, ".bin", "")
    refs = pc.if_else(pa.array(is_text), "", ref_all)

    # offset = within-doc cumsum of previous span lengths (media -> 1)
    lengths = np.where(is_text,
                       pc.utf8_length(text).to_numpy(zero_copy_only=False), 1)
    cum = np.concatenate([[0], np.cumsum(lengths)[:-1]]) if total else np.empty(0, np.int64)
    doc_starts = list_offsets[:-1]
    base = np.repeat(cum[doc_starts], n_spans) if total else np.empty(0, np.int64)
    offsets = (cum - base).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [pa.array(kind), text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
         refs.combine_chunks() if isinstance(refs, pa.ChunkedArray) else refs,
         pa.array(offsets)],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(pa.array(list_offsets), struct)


def _docs_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = derive.event_lonlat(idx + 1)
    doc_id = pc.binary_join_element_wise(
        "doc-", pc.utf8_lpad(pc.cast(pa.array(idx), pa.string()), 9, "0"),
        "")
    spans = make_span_lists(idx)
    geom = wkb.points_to_wkb_arrow(lon, lat)
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
