"""OGR-SQL WHERE-expression parser → pyarrow.compute evaluator.

Semantics of the reference's attribute filter
(`OGRLayer::SetAttributeFilter`, `ogr/ogrsf_frmts/generic/ogrlayer.cpp:751`;
operator registry `ogr/swq_op_registrar.cpp:28-61`; evaluator
`ogr/swq_op_general.cpp`): the supported surface is

    OR AND NOT  =  <>  !=  >=  <=  <  >  LIKE  ILIKE  IN  BETWEEN
    IS NULL / IS NOT NULL  + - * / %  string and numeric literals,
    parentheses, column references.

Built from the published OGR SQL dialect documentation — a fresh
recursive-descent implementation, not a port of swq_parser.y. The
compiled form is a function pyarrow.Table -> BooleanArray, applied
inside `map_batches` (vectorized, zero-copy).

LIKE semantics: OGR's LIKE is case-insensitive by default (GDAL >= 3.1,
swq_op_general.cpp SWQGeneralEvaluator LIKE notes); `%` any, `_` one.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><>|!=|>=|<=|=|<|>|\+|-|\*|/|%|\(|\)|,)
      | (?P<name>"[^"]+"|[A-Za-z_][A-Za-z_0-9]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "IN", "LIKE", "ILIKE", "BETWEEN", "IS", "NULL",
             "ESCAPE", "CAST", "AS"}

# OGR SQL CAST target types (ogr/swq_parser.y type list; SWQCastEvaluator
# swq_op_registrar.cpp:61) → arrow types. Temporal targets accept the
# OGR date formats 'YYYY-MM-DD[ HH:MM:SS]' and 'YYYY/MM/DD'.
_CAST_TYPES = {
    "INTEGER": pa.int32(),
    "BIGINT": pa.int64(),
    "SMALLINT": pa.int16(),
    "FLOAT": pa.float64(),
    "NUMERIC": pa.float64(),
    "CHARACTER": pa.string(),
    "STRING": pa.string(),
    "DATE": pa.date32(),
    "TIME": pa.time32("s"),
    "TIMESTAMP": pa.timestamp("s"),
}


class Token:
    def __init__(self, kind: str, value: Any):
        self.kind = kind  # num | str | op | name | kw | end
        self.value = value

    def __repr__(self):
        return f"Token({self.kind},{self.value!r})"


def _tokenize(text: str) -> List[Token]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize at: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            s = m.group("num")
            out.append(Token("num", float(s) if "." in s else int(s)))
        elif m.group("str") is not None:
            out.append(Token("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("op") is not None:
            out.append(Token("op", m.group("op")))
        else:
            name = m.group("name")
            if name.startswith('"'):
                out.append(Token("name", name[1:-1]))
            elif name.upper() in _KEYWORDS:
                out.append(Token("kw", name.upper()))
            else:
                out.append(Token("name", name))
    out.append(Token("end", None))
    return out


def _like_to_regex(pattern: str, escape: Optional[str] = None) -> str:
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if escape and c == escape and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


class _Parser:
    """expr := or_expr
    or_expr := and_expr (OR and_expr)*
    and_expr := not_expr (AND not_expr)*
    not_expr := NOT not_expr | predicate
    predicate := sum (comparison | IS [NOT] NULL | [NOT] IN (...) |
                 [NOT] LIKE str | [NOT] BETWEEN sum AND sum)?
    sum := term ((+|-) term)*
    term := factor ((*|/|%) factor)*
    factor := num | str | name | ( expr ) | - factor
    """

    def __init__(self, tokens: List[Token]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: Any = None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ValueError(f"expected {kind} {value}, got {t}")
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek().kind != "end":
            raise ValueError(f"trailing tokens at {self.peek()}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek().kind == "kw" and self.peek().value == "OR":
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.peek().kind == "kw" and self.peek().value == "AND":
            self.next()
            node = ("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.peek().kind == "kw" and self.peek().value == "NOT":
            self.next()
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        left = self.sum()
        t = self.peek()
        negate = False
        if t.kind == "kw" and t.value == "NOT":
            self.next()
            t = self.peek()
            negate = True
        if t.kind == "op" and t.value in ("=", "<>", "!=", ">=", "<=", "<", ">"):
            self.next()
            node = ("cmp", t.value, left, self.sum())
        elif t.kind == "kw" and t.value == "IS":
            self.next()
            isnot = False
            if self.peek().kind == "kw" and self.peek().value == "NOT":
                self.next()
                isnot = True
            self.expect("kw", "NULL")
            node = ("isnull", left)
            if isnot:
                node = ("not", node)
        elif t.kind == "kw" and t.value == "IN":
            self.next()
            self.expect("op", "(")
            vals = [self.literal()]
            while self.peek().kind == "op" and self.peek().value == ",":
                self.next()
                vals.append(self.literal())
            self.expect("op", ")")
            node = ("in", left, vals)
        elif t.kind == "kw" and t.value in ("LIKE", "ILIKE"):
            op = t.value
            self.next()
            pat = self.expect("str").value
            esc = None
            if self.peek().kind == "kw" and self.peek().value == "ESCAPE":
                self.next()
                esc = self.expect("str").value
            node = ("like", op, left, pat, esc)
        elif t.kind == "kw" and t.value == "BETWEEN":
            self.next()
            lo = self.sum()
            self.expect("kw", "AND")
            hi = self.sum()
            node = ("between", left, lo, hi)
        else:
            if negate:
                raise ValueError("dangling NOT")
            return left
        return ("not", node) if negate else node

    def literal(self):
        t = self.next()
        if t.kind in ("num", "str"):
            return ("lit", t.value)
        raise ValueError(f"expected literal, got {t}")

    def sum(self):
        node = self.term()
        while self.peek().kind == "op" and self.peek().value in ("+", "-"):
            op = self.next().value
            node = ("arith", op, node, self.term())
        return node

    def term(self):
        node = self.factor()
        while self.peek().kind == "op" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            node = ("arith", op, node, self.factor())
        return node

    def factor(self):
        t = self.next()
        if t.kind == "num" or t.kind == "str":
            return ("lit", t.value)
        if t.kind == "kw" and t.value == "CAST":
            self.expect("op", "(")
            inner = self.sum()
            self.expect("kw", "AS")
            ty = self.expect("name").value.upper()
            if ty not in _CAST_TYPES:
                raise ValueError(f"unsupported CAST type {ty}")
            # optional (width[, precision])
            if self.peek().kind == "op" and self.peek().value == "(":
                self.next()
                self.expect("num")
                if self.peek().kind == "op" and self.peek().value == ",":
                    self.next()
                    self.expect("num")
                self.expect("op", ")")
            self.expect("op", ")")
            return ("cast", ty, inner)
        if t.kind == "name":
            if self.peek().kind == "op" and self.peek().value == "(":
                # scalar function call (ogr/swq_op_registrar.cpp:28-61)
                self.next()
                args = []
                if not (self.peek().kind == "op" and self.peek().value == ")"):
                    args.append(self.sum())
                    while self.peek().kind == "op" and self.peek().value == ",":
                        self.next()
                        args.append(self.sum())
                self.expect("op", ")")
                fname = t.value.upper()
                if fname not in _FUNCS:
                    raise ValueError(f"unsupported function {fname}")
                return ("func", fname, args)
            return ("col", t.value)
        if t.kind == "op" and t.value == "(":
            node = self.or_expr()
            self.expect("op", ")")
            return node
        if t.kind == "op" and t.value == "-":
            return ("neg", self.factor())
        raise ValueError(f"unexpected token {t}")


def parse(expr: str):
    return _Parser(_tokenize(expr)).parse()


def _fn_substr(args):
    """OGR SUBSTR(str, start[, len]) — 1-based; negative start counts
    from the end (swq_op_general.cpp SUBSTR notes)."""
    s = args[0]
    start = args[1].as_py() if isinstance(args[1], pa.Scalar) else args[1]
    if isinstance(start, (int, float)):
        start = int(start)
        begin = start - 1 if start > 0 else start
    else:
        raise ValueError("SUBSTR start must be a literal integer")
    if len(args) >= 3:
        ln = int(args[2].as_py() if isinstance(args[2], pa.Scalar) else args[2])
        stop = (begin + ln) if begin >= 0 else (begin + ln if begin + ln < 0 else None)
        return pc.utf8_slice_codeunits(s, begin, stop)
    return pc.utf8_slice_codeunits(s, begin)


def _fn_hstore_get_value(args):
    """HSTORE_GET_VALUE(hstore_str, 'key') (swq_op_registrar.cpp:60,
    OGRHStoreGetValue in ogr_core): value for key in a
    'k=>v, "k2"=>"v2"' string, NULL when absent."""
    col, key = args[0], args[1]
    if not isinstance(key, pa.Scalar):
        raise ValueError("HSTORE_GET_VALUE key must be a literal string")
    k = re.escape(key.as_py())
    pat = (r'(?:^|,)\s*"?' + k + r'"?\s*=>\s*(?:"(?P<q>[^"]*)"|(?P<u>[^,]*))')
    ex = pc.extract_regex(col, pattern=pat)
    q = pc.struct_field(ex, "q")
    u = pc.struct_field(ex, "u")
    # Arrow fills non-participating groups with '' (not null): prefer the
    # quoted capture when it matched anything, else the unquoted one.
    val = pc.if_else(pc.equal(pc.fill_null(q, ""), ""), u, q)
    return pc.if_else(pc.is_null(ex), pa.scalar(None, pa.string()),
                      pc.utf8_trim_whitespace(pc.fill_null(val, "")))


_FUNCS = {
    "CONCAT": lambda args: pc.binary_join_element_wise(*args, ""),
    "UPPER": lambda args: pc.utf8_upper(args[0]),
    "LOWER": lambda args: pc.utf8_lower(args[0]),
    "LENGTH": lambda args: pc.cast(pc.utf8_length(args[0]), pa.int32()),
    "SUBSTR": _fn_substr,
    "HSTORE_GET_VALUE": _fn_hstore_get_value,
}


# --- SQLite-dialect spatial SQL functions --------------------------------
# The reference registers ST_* scalar functions into its SQLite dialect
# (`ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:627-878`, GEOS-backed).
# Here they are registered into the same _FUNCS table the WHERE filter and
# the ExecuteSQL planner (functions/ogrsql.py) dispatch through, over the
# repo's pure-python geometry kernels (geom/, stages/geom_ops.py).
# Geometry args/results are WKB binary; extra args (distances, quadsegs)
# are literals.

def _aslist(v):
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v.to_pylist()
    if isinstance(v, pa.Scalar):
        return v.as_py()
    return v


def _geo_unary(fn, out_type):
    """Elementwise WKB kernel lift: fn(buf, *extras) over a column or a
    scalar; nulls propagate."""

    def impl(args):
        g = _aslist(args[0])
        extras = [_aslist(a) for a in args[1:]]
        if isinstance(g, list):
            return pa.array([None if b is None else fn(b, *extras)
                             for b in g], type=out_type)
        return (pa.scalar(None, type=out_type) if g is None
                else pa.scalar(fn(g, *extras), type=out_type))

    return impl


def _geo_binary(fn):
    """Elementwise WKB predicate lift with scalar broadcast on either
    side (column vs literal geometry is the common shape)."""

    def impl(args):
        a, b = _aslist(args[0]), _aslist(args[1])
        la, lb = isinstance(a, list), isinstance(b, list)
        if la and lb:
            pairs = zip(a, b)
        elif la:
            pairs = ((x, b) for x in a)
        elif lb:
            pairs = ((a, y) for y in b)
        else:
            return pa.scalar(None if (a is None or b is None)
                             else bool(fn(a, b)), type=pa.bool_())
        return pa.array([None if (x is None or y is None)
                         else bool(fn(x, y)) for x, y in pairs],
                        type=pa.bool_())

    return impl


def _coords_len(c):
    c = np.asarray(c, dtype=float)[:, :2]
    if len(c) < 2:
        return 0.0
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def _wkb_length(buf: bytes) -> float:
    """ST_Length / ST_Perimeter: curve length; polygon ring perimeter
    (OGR_G_Length semantics over each kind)."""
    from ..geom import wkb as wkb_mod

    kind, payload = wkb_mod.parse_wkb(buf)
    if kind in ("point", "multipoint"):
        return 0.0
    if kind == "linestring":
        return _coords_len(payload)
    if kind == "multilinestring":
        return float(sum(_coords_len(c) for c in payload))
    if kind == "polygon":
        return float(sum(_coords_len(r) for r in payload))
    if kind == "multipolygon":
        return float(sum(_coords_len(r) for rings in payload
                         for r in rings))
    if kind == "geometrycollection":
        raise ValueError("ST_Length over geometry collections "
                         "not supported")
    raise ValueError(f"ST_Length: unsupported kind {kind}")


def _st_area(buf: bytes) -> float:
    from ..stages.geom_ops import wkb_centroid_area

    return float(wkb_centroid_area(buf)[2])


def _st_centroid(buf: bytes) -> bytes:
    from ..geom import wkb as wkb_mod
    from ..stages.geom_ops import wkb_centroid_area

    cx, cy, _a = wkb_centroid_area(buf)
    return wkb_mod.points_to_wkb(np.asarray([cx]), np.asarray([cy]))[0]


def _st_envelope(buf: bytes) -> bytes:
    from ..geom import wkb as wkb_mod

    box = wkb_mod.wkb_bbox([buf])[0]
    return wkb_mod.box_to_wkb(float(box[0]), float(box[1]),
                              float(box[2]), float(box[3]))


def _st_x(buf: bytes) -> float:
    from ..geom import wkb as wkb_mod

    kind, payload = wkb_mod.parse_wkb(buf)
    if kind != "point":
        raise ValueError("ST_X expects a point")
    return float(np.asarray(payload).reshape(-1, 2)[0, 0])


def _st_y(buf: bytes) -> float:
    from ..geom import wkb as wkb_mod

    kind, payload = wkb_mod.parse_wkb(buf)
    if kind != "point":
        raise ValueError("ST_Y expects a point")
    return float(np.asarray(payload).reshape(-1, 2)[0, 1])


def _st_geomfromtext(txt: str, *_srid) -> bytes:
    from ..geom.wkt import wkt_to_wkb

    return wkt_to_wkb(txt)


def _st_astext(buf: bytes) -> str:
    from ..geom.wkt import wkb_to_wkt

    return wkb_to_wkt(buf)


def _st_buffer(buf: bytes, dist, quadsegs=8) -> bytes:
    from ..geom.unary import buffer_wkb

    return buffer_wkb(buf, float(dist), int(quadsegs))


def _st_convexhull(buf: bytes) -> bytes:
    from ..geom.unary import convex_hull_wkb

    return convex_hull_wkb(buf)


def _st_isvalid(buf: bytes) -> bool:
    from ..stages.geom_ops import _check_one_geometry

    ok, _reason = _check_one_geometry(buf)
    return bool(ok)


def _st_isempty(buf: bytes) -> bool:
    from ..geom import wkb as wkb_mod

    _kind, payload = wkb_mod.parse_wkb(buf)
    if isinstance(payload, np.ndarray):
        return len(payload) == 0
    return len(payload) == 0


def _dispatch_pred(name: str, a: bytes, b: bytes) -> bool:
    """Spatial predicate with point-aware dispatch: the geom/predicates
    kernels are area-geometry kernels; point operands route through
    point_within / coordinate equality (the common SQL shapes:
    ST_Within(point, poly), ST_Intersects(poly, point))."""
    from ..geom import predicates as P
    from ..geom import wkb as W

    ka = W.parse_wkb(a)[0]
    kb = W.parse_wkb(b)[0]
    pa_, pb_ = ka == "point", kb == "point"
    if not pa_ and not pb_:
        if name == "equals":
            return P.contains(a, b) and P.within(a, b)
        return getattr(P, name)(a, b)
    if pa_ and pb_:
        ca = np.asarray(W.parse_wkb(a)[1]).reshape(-1, 2)[0]
        cb = np.asarray(W.parse_wkb(b)[1]).reshape(-1, 2)[0]
        eq = bool(np.all(ca == cb))
        return {"intersects": eq, "equals": eq, "contains": eq,
                "within": eq, "touches": False, "overlaps": False,
                "disjoint": not eq}[name]
    if pa_:
        px, py = np.asarray(W.parse_wkb(a)[1]).reshape(-1, 2)[0]
        poly, point_first = b, True
    else:
        px, py = np.asarray(W.parse_wkb(b)[1]).reshape(-1, 2)[0]
        poly, point_first = a, False
    inside = P.point_within(float(px), float(py), poly)
    return {"intersects": inside, "disjoint": not inside,
            "contains": False if point_first else inside,
            "within": inside if point_first else False,
            "touches": False, "overlaps": False,
            "equals": False}[name]


def _pred(name):
    return lambda a, b: _dispatch_pred(name, a, b)


_FUNCS.update({
    "ST_AREA": _geo_unary(_st_area, pa.float64()),
    "ST_LENGTH": _geo_unary(_wkb_length, pa.float64()),
    "ST_PERIMETER": _geo_unary(_wkb_length, pa.float64()),
    "ST_X": _geo_unary(_st_x, pa.float64()),
    "ST_Y": _geo_unary(_st_y, pa.float64()),
    "ST_CENTROID": _geo_unary(_st_centroid, pa.binary()),
    "ST_ENVELOPE": _geo_unary(_st_envelope, pa.binary()),
    "ST_BUFFER": _geo_unary(_st_buffer, pa.binary()),
    "ST_CONVEXHULL": _geo_unary(_st_convexhull, pa.binary()),
    "ST_ASTEXT": _geo_unary(_st_astext, pa.string()),
    "ST_GEOMFROMTEXT": _geo_unary(_st_geomfromtext, pa.binary()),
    "ST_ASBINARY": _geo_unary(lambda b: b, pa.binary()),
    "ST_GEOMFROMWKB": _geo_unary(lambda b: b, pa.binary()),
    "ST_ISVALID": _geo_unary(_st_isvalid, pa.bool_()),
    "ST_ISEMPTY": _geo_unary(_st_isempty, pa.bool_()),
    "ST_INTERSECTS": _geo_binary(_pred("intersects")),
    "ST_DISJOINT": _geo_binary(_pred("disjoint")),
    "ST_CONTAINS": _geo_binary(_pred("contains")),
    "ST_WITHIN": _geo_binary(_pred("within")),
    "ST_OVERLAPS": _geo_binary(_pred("overlaps")),
    "ST_TOUCHES": _geo_binary(_pred("touches")),
    "ST_EQUALS": _geo_binary(_pred("equals")),
})


_CMP = {
    "=": pc.equal, "<>": pc.not_equal, "!=": pc.not_equal,
    ">": pc.greater, ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal,
}
_ARITH = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
          "/": pc.divide, "%": lambda a, b: pc.subtract(a, pc.multiply(pc.floor(pc.divide(a, b)), b))}


def _eval(node, table: pa.Table):
    op = node[0]
    if op == "lit":
        return pa.scalar(node[1])
    if op == "col":
        if node[1] == "OGR_GEOM_AREA" and "geometry" in table.column_names:
            # OGR special field (ogr/ogrfeaturequery.cpp:37-38): area of
            # the feature geometry
            from ..stages.geom_ops import wkb_centroid_area

            bufs = table["geometry"].to_numpy(zero_copy_only=False)
            return pa.array([wkb_centroid_area(b)[2] for b in bufs])
        if node[1] == "FID" and "FID" not in table.column_names:
            # OGR special field (ogr/ogrfeaturequery.cpp:37): feature id.
            # Maps to a "fid" column when present.
            if "fid" in table.column_names:
                return table["fid"]
            raise KeyError("FID special field needs a 'fid' column")
        if node[1] not in table.column_names:
            raise KeyError(f"unknown column {node[1]}")
        return table[node[1]]
    if op == "neg":
        return pc.negate(_eval(node[1], table))
    if op == "cast":
        v = _eval(node[2], table)
        target = _CAST_TYPES[node[1]]
        vtype = v.type
        if node[1] in ("DATE", "TIME", "TIMESTAMP") and pa.types.is_string(vtype):
            # temporal CAST from OGR date strings ('YYYY-MM-DD[ HH:MM:SS]'
            # or 'YYYY/MM/DD'), SWQCastEvaluator temporal branch
            v = pc.replace_substring(v, "/", "-")
            if node[1] == "TIME":
                ts = pc.strptime(v, format="%H:%M:%S", unit="s")
            elif node[1] == "TIMESTAMP":
                ts = pc.strptime(v, format="%Y-%m-%d %H:%M:%S", unit="s")
            else:
                ts = pc.strptime(v, format="%Y-%m-%d", unit="s")
            return pc.cast(ts, target)
        if isinstance(v, pa.Scalar):
            return v.cast(target)
        # numeric→int truncates in OGR (C cast semantics)
        if pa.types.is_integer(target) and pa.types.is_floating(
                v.type if not isinstance(v, pa.ChunkedArray) else v.type):
            v = pc.trunc(v)
        return pc.cast(v, target, safe=False)
    if op == "func":
        args = [_eval(a, table) for a in node[2]]
        return _FUNCS[node[1]](args)
    if op == "arith":
        return _ARITH[node[1]](_eval(node[2], table), _eval(node[3], table))
    if op == "cmp":
        return _CMP[node[1]](_eval(node[2], table), _eval(node[3], table))
    if op == "and":
        return pc.and_kleene(_eval(node[1], table), _eval(node[2], table))
    if op == "or":
        return pc.or_kleene(_eval(node[1], table), _eval(node[2], table))
    if op == "not":
        return pc.invert(_eval(node[1], table))
    if op == "isnull":
        return pc.is_null(_eval(node[1], table))
    if op == "in":
        vals = [v[1] for v in node[2]]
        v = _eval(node[1], table)
        r = pc.is_in(v, value_set=pa.array(vals))
        # SQL three-valued logic: NULL IN (...) is NULL, not FALSE
        return pc.if_else(pc.is_null(v), pa.scalar(None, pa.bool_()), r)
    if op == "between":
        v = _eval(node[1], table)
        return pc.and_kleene(pc.greater_equal(v, _eval(node[2], table)),
                             pc.less_equal(v, _eval(node[3], table)))
    if op == "like":
        _kind, like_op, left, pat, esc = node
        rx = _like_to_regex(pat, esc)
        v = _eval(left, table)
        # OGR LIKE is case-insensitive by default (like ILIKE)
        return pc.match_substring_regex(v, rx, ignore_case=True)
    raise ValueError(f"unknown node {node}")


def compile_filter(expr: str):
    """-> fn(pa.Table) -> pa.BooleanArray (null ⇒ row dropped)."""
    tree = parse(expr)

    def fn(table: pa.Table):
        mask = _eval(tree, table)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        return mask

    return fn


def attribute_filter(ds, expr: str):
    """ds.filter with an OGR SQL WHERE expression (SetAttributeFilter)."""
    fn = compile_filter(expr)

    def apply(batch: pa.Table) -> pa.Table:
        mask = fn(batch)
        mask = pc.fill_null(mask, False)
        return batch.filter(mask)

    return ds.map_batches(apply, batch_format="pyarrow")
