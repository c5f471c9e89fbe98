"""OGR SQL ExecuteSQL analog: a SELECT planner over Ray Datasets.

Reference surface: OGR's SQL dialect executor
(`ogr/ogr_gensql.cpp` OGRGenSQLResultsLayer + `ogr/swq_parser.y`) — the
engine behind ``ogrinfo -sql`` / ``ogr2ogr -sql``. This module parses
the same statement subset and lowers it onto the repo's distributed
primitives:

    SELECT [DISTINCT] item, ...        -> map_batches projection
           agg(expr) [AS alias]        -> relational.grouped_agg /
                                          global_agg (partial+final)
    FROM layer                         -> layers[name]
    [LEFT] JOIN layer2 ON a = b        -> relational.broadcast_hash_join
                                          (secondary table, OGR's join
                                          model: dimension-side lookup)
    WHERE expr                         -> swq-compiled Arrow filter
    GROUP BY col, ...                  -> hash-partitioned groupby
    HAVING expr                        -> post-agg filter
    ORDER BY col [ASC|DESC], ...       -> sort (topk when LIMIT given)
    LIMIT n                            -> limit

Subset notes (documented deviations):
* join condition uses unqualified column names (left vs right side
  resolved from the schemas at execution; OGR requires the secondary
  table to fit the lookup model too, `ogr_gensql.cpp` secondary-table
  joins are row-wise lookups);
* COUNT(DISTINCT col) is supported — a single distinct item next to
  decomposable aggregates under GROUP BY lowers to fused two-level
  aggregation (groupby(keys+col) partials, then a tiny groupby(keys)
  re-aggregate: one pass over the base table); other combinations take
  the general distinct-branch + join-back plan. Aggregates are
  COUNT/SUM/MIN/MAX/AVG;
* LIKE is case-insensitive (OGR semantics — mirror with ILIKE in ANSI
  engines).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Mapping, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import swq

_AGGS = {"COUNT", "SUM", "MIN", "MAX", "AVG"}


def _is_word(tok, word: str) -> bool:
    return ((tok.kind == "name" or tok.kind == "kw")
            and str(tok.value).upper() == word)


class _StmtParser(swq._Parser):
    """Statement-level parser reusing the swq expression grammar."""

    def accept_word(self, word: str) -> bool:
        if _is_word(self.peek(), word):
            self.next()
            return True
        return False

    def expect_word(self, word: str):
        if not self.accept_word(word):
            raise ValueError(f"expected {word}, got {self.peek()}")

    def parse_select(self) -> Dict[str, Any]:
        self.expect_word("SELECT")
        distinct = self.accept_word("DISTINCT")
        items = [self._select_item(0)]
        while self.peek().kind == "op" and self.peek().value == ",":
            self.next()
            items.append(self._select_item(len(items)))
        self.expect_word("FROM")
        from_name = self.expect("name").value
        plan: Dict[str, Any] = {"items": items, "from": from_name,
                                "distinct": distinct, "join": None,
                                "where": None, "group_by": [],
                                "having": None, "order_by": [],
                                "limit": None}
        if _is_word(self.peek(), "LEFT") or _is_word(self.peek(), "JOIN"):
            how = "left outer" if self.accept_word("LEFT") else "inner"
            self.expect_word("JOIN")
            jname = self.expect("name").value
            self.expect_word("ON")
            a = self.expect("name").value
            self.expect("op", "=")
            b = self.expect("name").value
            plan["join"] = {"layer": jname, "on": (a, b), "how": how}
        if self.accept_word("WHERE"):
            plan["where"] = self.or_expr()
        if self.accept_word("GROUP"):
            self.expect_word("BY")
            plan["group_by"].append(self.expect("name").value)
            while self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                plan["group_by"].append(self.expect("name").value)
        if self.accept_word("HAVING"):
            plan["having"] = self.or_expr()
        if self.accept_word("ORDER"):
            self.expect_word("BY")
            while True:
                col = self.expect("name").value
                desc = False
                if self.accept_word("DESC"):
                    desc = True
                else:
                    self.accept_word("ASC")
                plan["order_by"].append((col, desc))
                if not (self.peek().kind == "op" and self.peek().value == ","):
                    break
                self.next()
        if self.accept_word("LIMIT"):
            plan["limit"] = int(self.expect("num").value)
        if self.peek().kind != "end":
            raise ValueError(f"trailing tokens at {self.peek()}")
        return plan

    def _select_item(self, i: int) -> Dict[str, Any]:
        t = self.peek()
        if t.kind == "op" and t.value == "*":
            self.next()
            return {"kind": "star"}
        if t.kind == "name" and str(t.value).upper() in _AGGS \
                and self.toks[self.i + 1].kind == "op" \
                and self.toks[self.i + 1].value == "(":
            fn = str(self.next().value).upper()
            self.expect("op", "(")
            distinct = self.accept_word("DISTINCT")
            if self.peek().kind == "op" and self.peek().value == "*":
                self.next()
                node = None
                default = "count_star"
            else:
                node = self.or_expr()
                base = node[1] if node[0] == "col" else f"expr{i}"
                default = f"{fn.lower()}_{base}"
            self.expect("op", ")")
            alias = self._alias() or default
            return {"kind": "agg", "fn": fn, "node": node,
                    "distinct": distinct, "alias": alias}
        node = self.or_expr()
        alias = self._alias() or (node[1] if node[0] == "col" else f"expr{i}")
        return {"kind": "expr", "node": node, "alias": alias}

    def _alias(self) -> Optional[str]:
        if self.peek().kind == "kw" and self.peek().value == "AS":
            self.next()
            return self.expect("name").value
        return None


def parse_select(sql: str) -> Dict[str, Any]:
    return _StmtParser(swq._tokenize(sql)).parse_select()


def _project(ds: ray.data.Dataset, items: List[Dict[str, Any]]):
    def fn(batch: pa.Table) -> pa.Table:
        cols = {}
        for it in items:
            if it["kind"] == "star":
                for c in batch.column_names:
                    cols[c] = batch[c]
            else:
                v = swq._eval(it["node"], batch)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * len(batch))
                cols[it["alias"]] = v
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _filter(ds: ray.data.Dataset, node) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        mask = swq._eval(node, batch)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(fn, batch_format="pyarrow")


def _small_table(ds: ray.data.Dataset) -> pa.Table:
    """Materialize a small (dimension/aggregate-result) Dataset as one
    Arrow table, skipping empty-schema blocks."""
    tabs = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in ray.get(ds.to_arrow_refs())]
    tabs = [t for t in tabs if t.num_columns > 0]
    if not tabs:
        raise ValueError("empty result for a small-side table")
    return pa.concat_tables(tabs)


def execute_sql(sql: str,
                layers: Mapping[str, Union[ray.data.Dataset,
                                           Callable[[], ray.data.Dataset]]],
                ) -> ray.data.Dataset:
    """Run an OGR SQL SELECT over named layers (ExecuteSQL analog)."""
    from ..pipelines import relational as rel

    plan = parse_select(sql)

    def layer(name: str) -> ray.data.Dataset:
        if name not in layers:
            raise KeyError(f"unknown layer {name!r}; have {sorted(layers)}")
        v = layers[name]
        return v() if callable(v) else v

    ds = layer(plan["from"])

    if plan["join"]:
        j = plan["join"]
        right_ds = layer(j["layer"])
        right = _small_table(right_ds)
        a, b = j["on"]
        left_cols = ds.schema().names
        left_on, right_on = (a, b) if a in left_cols else (b, a)
        if right_on not in right.column_names:
            raise ValueError(f"join column {right_on!r} not in right layer")
        ds = rel.broadcast_hash_join(ds, right, left_on, right_on, how=j["how"])

    if plan["where"] is not None:
        ds = _filter(ds, plan["where"])

    aggs = [it for it in plan["items"] if it["kind"] == "agg"]
    if aggs:
        # pre-project aggregate input expressions to temp columns
        keys = plan["group_by"]
        tmp_nodes = {}
        specs, cd_items = [], []
        for n, it in enumerate(aggs):
            if it["node"] is None:          # COUNT(*)
                specs.append(("count", keys[0] if keys else "__one", it["alias"]))
                continue
            col = f"__a{n}"
            tmp_nodes[col] = it["node"]
            if it["distinct"]:
                if it["fn"] != "COUNT":
                    raise ValueError("DISTINCT only with COUNT")
                cd_items.append((col, it["alias"]))
                continue
            op = {"COUNT": "count", "SUM": "sum", "MIN": "min",
                  "MAX": "max", "AVG": "mean"}[it["fn"]]
            specs.append((op, col, it["alias"]))

        def prep(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in keys}
            if not keys:
                cols["__one"] = pa.array(np.ones(len(batch), dtype=np.int64))
            elif any(s[1] == "__one" for s in specs):
                cols["__one"] = pa.array(np.ones(len(batch), dtype=np.int64))
            for col, node in tmp_nodes.items():
                v = swq._eval(node, batch)
                if isinstance(v, pa.Scalar):
                    v = pa.array([v.as_py()] * len(batch))
                cols[col] = v
            return pa.table(cols)

        prepped = ds.map_batches(prep, batch_format="pyarrow")
        fixed_specs = [(op, ("__one" if c == "__one" or not keys and op == "count"
                             else c), al) for op, c, al in specs]
        # Fused COUNT(DISTINCT): when there is exactly one distinct item
        # alongside decomposable aggregates and a GROUP BY, rewrite as
        # two-level aggregation — groupby(keys + cd_col) computes the
        # partials in ONE pass over the base table, then a tiny
        # groupby(keys) re-aggregates (count→sum, sum→sum, min→min,
        # max→max, mean→sum/sum) and counts rows for the distinct
        # cardinality. This replaces the naive plan's second full scan
        # (distinct branch) and its broadcast join-back.
        if (len(cd_items) == 1 and keys and fixed_specs
                and all(op in ("count", "sum", "min", "max", "mean")
                        for op, _, _ in fixed_specs)):
            cd_col, cd_alias = cd_items[0]
            l1, l2, mean_fix = [], [], []
            for i, (op, c, al) in enumerate(fixed_specs):
                if op == "count":
                    l1.append(("count", c, f"__c{i}"))
                    l2.append(("sum", f"__c{i}", al))
                elif op in ("sum", "min", "max"):
                    l1.append((op, c, f"__p{i}"))
                    l2.append((op if op != "sum" else "sum", f"__p{i}", al))
                else:  # mean = sum/count across both levels
                    l1.append(("sum", c, f"__ms{i}"))
                    l1.append(("count", c, f"__mc{i}"))
                    l2.append(("sum", f"__ms{i}", f"__MS{i}"))
                    l2.append(("sum", f"__mc{i}", f"__MC{i}"))
                    mean_fix.append((al, i))
            l2.append(("count", cd_col, cd_alias))
            level1 = rel.grouped_agg(prepped, keys + [cd_col], l1)
            out = rel.grouped_agg(level1, keys, l2)
            if mean_fix:
                def fix_means(batch: pa.Table, _fx=tuple(mean_fix)) -> pa.Table:
                    for al, i in _fx:
                        v = pc.divide(
                            pc.cast(batch[f"__MS{i}"], pa.float64()),
                            pc.cast(batch[f"__MC{i}"], pa.float64()))
                        batch = batch.append_column(al, v).drop_columns(
                            [f"__MS{i}", f"__MC{i}"])
                    return batch

                out = out.map_batches(fix_means, batch_format="pyarrow")
            ds = out
            want = keys + [it["alias"] for it in plan["items"]
                           if it["kind"] == "agg"]
            ds = ds.map_batches(
                lambda b, _w=tuple(want): b.select(list(_w)),
                batch_format="pyarrow")
            return _finish_select(ds, plan)
        parts = []
        if fixed_specs:
            if keys:
                parts.append(rel.grouped_agg(prepped, keys, fixed_specs))
            else:
                parts.append(rel.global_agg(prepped, fixed_specs))
        for col, alias in cd_items:
            d = rel.distinct(prepped, keys + [col])
            if keys:
                parts.append(rel.grouped_agg(d, keys, [("count", col, alias)]))
            else:
                parts.append(rel.global_agg(d, [("count", col, alias)]))
        out = parts[0]
        for extra in parts[1:]:
            tab = _small_table(extra)
            if keys:
                out = rel.broadcast_hash_join(out, tab, keys, keys, how="left outer")
            else:
                ref_cols = {c: tab[c] for c in tab.column_names}

                def attach(batch: pa.Table, _cols=ref_cols) -> pa.Table:
                    for c, v in _cols.items():
                        batch = batch.append_column(c, v)
                    return batch

                out = out.map_batches(attach, batch_format="pyarrow")
        ds = out
        # reorder to the select-list order (keys first per grouped_agg)
        want = keys + [it["alias"] for it in plan["items"] if it["kind"] == "agg"]
        explicit = [it["alias"] for it in plan["items"] if it["kind"] == "expr"
                    and it["node"][0] == "col" and it["node"][1] in keys]
        _ = explicit  # group keys referenced as plain items are already in `want`
        ds = ds.map_batches(
            lambda b, _w=tuple(want): b.select(list(_w)), batch_format="pyarrow")
    else:
        if not (len(plan["items"]) == 1 and plan["items"][0]["kind"] == "star"):
            ds = _project(ds, plan["items"])
        if plan["distinct"]:
            names = ds.schema().names
            ds = rel.distinct(ds, names)

    return _finish_select(ds, plan)


def _finish_select(ds: ray.data.Dataset, plan: dict) -> ray.data.Dataset:
    """Shared SELECT tail: HAVING filter, ORDER BY (topk under LIMIT),
    LIMIT."""
    from ..pipelines import relational as rel

    if plan["having"] is not None:
        ds = _filter(ds, plan["having"])

    if plan["order_by"]:
        cols = [c for c, _ in plan["order_by"]]
        desc = [d for _, d in plan["order_by"]]
        if plan["limit"] is not None:
            return rel.topk(ds, cols, plan["limit"], descending=desc)
        return ds.sort(cols, descending=desc)
    if plan["limit"] is not None:
        return ds.limit(plan["limit"])
    return ds
