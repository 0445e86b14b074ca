"""COBOL copybook parsing and mainframe record decoding, pure Python.

Re-expresses the reference's CobolFileReader, which delegates to the
Cobrix library (CobolFileReader.java:100-176 builds a Cobrix VarLenReader
and maps its AST to a Connect schema; CobrixReader.scala:1-15). Spark
ships no Cobol datasource and Cobrix is a JVM-only dependency, so this
module implements the relevant subset of the public COBOL copybook /
mainframe data-format rules directly:

- copybook grammar: level numbers, nested groups, ``PIC`` clauses
  (9/X/A/S/V/P/Z and editing characters), ``USAGE`` COMP/COMP-0/COMP-4/
  COMP-5/BINARY, COMP-1, COMP-2, COMP-3/PACKED-DECIMAL, ``OCCURS n``,
  ``OCCURS [min TO] max DEPENDING ON counter`` (single ODO, counter
  before the array — see find_odo/specialize_odo),
  ``REDEFINES``, ``SIGN [IS] LEADING|TRAILING [SEPARATE [CHARACTER]]``,
  FILLER, level-88 condition names (skipped), comment columns (the
  reference pins Cobrix's CommentPolicy(true, 6, 72) —
  CobolFileReader.java:241);
- storage sizing: DISPLAY = one byte per picture character position;
  COMP-3 = floor(digits/2)+1; BINARY buckets 2/4/8 bytes for <=4/<=9/<=18
  digits and bit-exact byte counts above that (verified against the
  reference's own Cobrix-generated fixtures, where 19- and 20-digit
  binaries occupy 9 bytes and 37-digit ones 16);
- decoding: EBCDIC (code page cp037 = Cobrix's "common") or ASCII
  character data, zoned-decimal sign overpunch (C/D/F zones), separate
  leading/trailing signs, packed decimal (BCD) with C/D/F sign nibbles,
  big-endian two's-complement binary with out-of-precision -> null
  (matches the reference test expecting a REDEFINES misread to be null,
  CobolFileReaderTest.java:checkData TAXPAYER_NUM), IBM hexadecimal and
  IEEE-754 floating point for COMP-1/COMP-2;
- type mapping (CobolFileReader.java:schemaForField): integral digits
  <=9 -> int32, <=18 -> int64, else float64; scaled/edited decimals ->
  float64 (COMP-1 -> float32); character -> string.

Decoding is numpy-vectorized: a task's records form an (n_records x
lrecl) byte matrix; every field decodes with column slices + table
lookups, no per-record Python loop on the common paths (display digits,
packed decimal, 2/4/8-byte binary). Rare shapes (edited pictures,
>8-byte binaries) fall back to per-value parsing.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd

__all__ = [
    "CopybookError",
    "Field",
    "parse_copybook",
    "find_odo",
    "specialize_odo",
    "flatten",
    "decode_records",
    "decode_records_odo",
    "encode_records",
    "spark_type_for",
]


class CopybookError(ValueError):
    pass


# --------------------------------------------------------------------- model


@dataclass
class Picture:
    """Parsed PIC clause."""

    raw: str
    kind: str  # 'alpha' | 'num'
    digits: int = 0  # digit positions (9 and Z)
    scale: int = 0  # fraction digits incl. P adjustment (can be negative)
    signed: bool = False
    edited: bool = False  # contains editing chars -> parse via string
    char_size: int = 0  # storage bytes when DISPLAY


@dataclass
class Field:
    level: int
    name: str
    pic: Picture | None = None
    usage: str = "display"  # display|comp|comp1|comp2|comp3
    occurs: int = 0  # 0 = not an array (for ODO: the MAX occurrence count)
    occurs_min: int = 0  # OCCURS min TO max DEPENDING ON lower bound
    depending_on: str | None = None  # ODO counter item name
    redefines: str | None = None
    sign_separate: bool = False
    sign_leading: bool = False  # overpunch/separate position
    sign_clause: bool = False
    is_filler: bool = False  # FILLER item: occupies layout bytes, no output
    children: list["Field"] = dc_field(default_factory=list)
    # computed layout
    offset: int = 0
    size: int = 0  # size of ONE occurrence

    @property
    def is_group(self) -> bool:
        return bool(self.children)

    @property
    def extent(self) -> int:
        return self.size * (self.occurs or 1)


# ------------------------------------------------------------------- parsing

_PAREN = re.compile(r"([9XAZPB0/])\((\d+)\)")
_TOKEN_FIXES = (
    ("PACKED-DECIMAL", "COMP-3"),
    ("COMPUTATIONAL-3", "COMP-3"),
    ("COMPUTATIONAL-1", "COMP-1"),
    ("COMPUTATIONAL-2", "COMP-2"),
    ("COMPUTATIONAL-5", "COMP-5"),
    ("COMPUTATIONAL-4", "COMP-4"),
    ("COMPUTATIONAL-0", "COMP-0"),
    ("COMPUTATIONAL", "COMP"),
)


def _strip_columns(text: str, fixed: bool | None = None) -> list[str]:
    """Apply the fixed-format comment policy the reference configures:
    drop columns 1-6 and 73+ (CobolFileReader.java:241 CommentPolicy),
    drop '*'/'/' comment lines. ``fixed=None`` auto-detects (lines whose
    first 6 columns hold only digits/spaces look like a sequence area);
    the heuristic can misfire on free-format copybooks indented 1-5
    spaces, so parse_copybook retries the other mode on parse failure."""
    lines = text.replace("\t", "        ").splitlines()
    if fixed is None:
        fixed = any(
            len(ln) > 6 and ln[:6].strip("0123456789 ") == "" and ln.strip()
            for ln in lines
        )
    out = []
    for ln in lines:
        body = ln[6:72] if fixed else ln
        if body[:1] in ("*", "/"):
            continue
        out.append(body)
    return out


def _expand_pic(p: str) -> str:
    while True:
        new = _PAREN.sub(lambda m: m.group(1) * int(m.group(2)), p)
        if new == p:
            return new
        p = new


def _parse_pic(raw: str) -> Picture:
    expanded = _expand_pic(raw.upper())
    if set(expanded) <= set("XA") and expanded:
        return Picture(raw=raw, kind="alpha", char_size=len(expanded))
    signed = expanded.startswith("S") or expanded.startswith("+") or expanded.startswith("-")
    body = expanded[1:] if expanded.startswith("S") else expanded
    # editing/insertion characters (incl. B=blank, 0, / insertion) force
    # the string-parse decode path: their byte positions are not digits
    edited = any(c in body for c in "Z.,+-$*B0/") or "CR" in body or "DB" in body
    # split at V or explicit '.' into int/frac parts
    digits = sum(1 for c in body if c in "9Z")
    # P scaling: Ps before the first 9 (fraction side, after an implied V)
    # push the decimal point left; Ps after the last 9 push it right.
    first9 = body.find("9")
    last9 = body.rfind("9")
    p_left = body[:first9].count("P") if first9 >= 0 else 0
    p_right = body[last9 + 1 :].count("P") if last9 >= 0 else 0
    if "V" in body:
        frac = sum(1 for c in body.split("V", 1)[1] if c in "9Z")
    elif "." in body:
        frac = sum(1 for c in body.split(".", 1)[1] if c in "9Z")
    else:
        frac = 0
    scale = frac + p_left - p_right
    if p_left:
        scale = digits + p_left if "V" not in body else scale
    # storage: every picture char except V, S(overpunch) and P takes a byte
    char_size = sum(1 for c in body if c not in "VPS")
    return Picture(
        raw=raw,
        kind="num",
        digits=digits,
        scale=scale,
        signed=signed,
        edited=edited,
        char_size=char_size,
    )


def _tokenize(text: str, fixed: bool | None = None) -> list[list[str]]:
    src = " ".join(_strip_columns(text, fixed))
    for a, b in _TOKEN_FIXES:
        # boundaries that also exclude '-' : the usage keyword
        # PACKED-DECIMAL must not rewrite inside a field NAME like
        # PACKED-DECIMAL-FLAG (plain \b would, since '-' is non-word)
        src = re.sub(rf"(?<![\w-]){a}(?![\w-])", b, src, flags=re.IGNORECASE)
    # statements end with '.' followed by whitespace/EOF
    stmts = re.split(r"\.(?:\s+|$)", src)
    return [s.split() for s in stmts if s.strip()]


def parse_copybook(text: str) -> Field:
    """Parse copybook text into a field tree rooted at a synthetic node
    whose children are the 01-level records. Raises CopybookError on
    empty/unusable input (the reference rejects an empty copybook,
    CobolFileReaderTest.java emptyCopybook).

    Column handling: auto-detects fixed format (sequence area in columns
    1-6, code in 7-72) vs free format; if the detected mode fails to
    parse, the other mode is tried before giving up — a free-format
    copybook indented 1-5 spaces would otherwise lose its level numbers
    to the column strip."""
    if not text or not text.strip():
        raise CopybookError("Copybook is not specified.")
    try:
        return _parse_copybook_mode(text, None)
    except CopybookError as first_err:
        for mode in (False, True):
            try:
                return _parse_copybook_mode(text, mode)
            except CopybookError:
                continue
        raise first_err


def _parse_copybook_mode(text: str, fixed: bool | None) -> Field:
    root = Field(level=0, name="_root")
    stack: list[Field] = [root]
    n_data = 0
    n_fillers = 0
    for toks in _tokenize(text, fixed):
        if len(toks) < 2 or not toks[0].isdigit():
            raise CopybookError(f"Unparseable copybook statement: {' '.join(toks)[:80]}")
        level = int(toks[0])
        if level in (66, 88, 77):
            continue  # renames/conditions/standalone not part of the record
        name = toks[1].upper()
        is_filler = name == "FILLER"
        if is_filler:
            # unique per-parse names (Cobrix's FILLER_1/FILLER_2 rule):
            # sibling FILLER groups with same-named children would
            # otherwise flatten to colliding column names
            n_fillers += 1
            name = f"FILLER_{n_fillers}"
        f = Field(level=level, name=name.replace("-", "_"), is_filler=is_filler)
        i = 2
        while i < len(toks):
            t = toks[i].upper()
            if t in ("PIC", "PICTURE"):
                i += 1
                if toks[i].upper() == "IS":
                    i += 1
                f.pic = _parse_pic(toks[i])
            elif t == "REDEFINES":
                i += 1
                f.redefines = toks[i].upper().replace("-", "_")
            elif t == "OCCURS":
                i += 1
                lo = int(toks[i])
                if i + 1 < len(toks) and toks[i + 1].upper() == "TO":
                    f.occurs_min = lo
                    i += 2
                    f.occurs = int(toks[i])
                else:
                    f.occurs = lo
                if i + 1 < len(toks) and toks[i + 1].upper() == "TIMES":
                    i += 1
                if i + 1 < len(toks) and toks[i + 1].upper() == "DEPENDING":
                    i += 1
                    if i + 1 < len(toks) and toks[i + 1].upper() == "ON":
                        i += 1
                    i += 1
                    if i >= len(toks):
                        raise CopybookError(
                            f"OCCURS DEPENDING ON in {name} has no counter name"
                        )
                    f.depending_on = toks[i].upper().replace("-", "_")
            elif t in ("COMP", "COMP-0", "COMP-4", "COMP-5", "BINARY"):
                f.usage = "comp"
            elif t == "COMP-1":
                f.usage = "comp1"
            elif t == "COMP-2":
                f.usage = "comp2"
            elif t == "COMP-3":
                f.usage = "comp3"
            elif t == "SIGN":
                f.sign_clause = True
            elif t in ("LEADING", "TRAILING"):
                f.sign_leading = t == "LEADING"
                f.sign_clause = True
            elif t == "SEPARATE":
                f.sign_separate = True
                if i + 1 < len(toks) and toks[i + 1].upper() == "CHARACTER":
                    i += 1
            elif t in ("IS", "USAGE", "DISPLAY", "SYNC", "SYNCHRONIZED", "JUST", "JUSTIFIED", "RIGHT"):
                pass
            elif t == "VALUE" or t == "VALUES":
                i = len(toks)  # initial VALUE literal: irrelevant to layout
                break
            else:
                raise CopybookError(f"Unsupported copybook clause {t!r} in {name}")
            i += 1
        # COMP-1/COMP-2 may legally omit PIC
        if f.usage in ("comp1", "comp2"):
            f.pic = f.pic or Picture(raw="", kind="num", digits=0)
        while stack and stack[-1].level >= level and stack[-1] is not root:
            stack.pop()
        stack[-1].children.append(f)
        stack.append(f)
        n_data += 1
    if not n_data or not root.children:
        raise CopybookError("Copybook has no data items")
    # multiple 01-level records are record VARIANTS of one file: they
    # OVERLAY at offset 0 (implicit REDEFINES of each other, the Cobrix
    # multi-root rule) — laying them out sequentially would double the
    # record length and decode the later variants from the wrong bytes
    for top in root.children:
        top.offset = 0
        if top.is_group:
            _layout(top)
        else:
            top.size = _field_size(top)
    root.size = max(c.offset + c.extent for c in root.children)
    return root


# -------------------------------------------------------------------- layout


def _binary_size(digits: int) -> int:
    """Binary (COMP) storage bytes. Standard COBOL buckets through 18
    digits; above that the byte count that exactly holds the decimal
    precision plus sign bit (matches the reference fixture layout:
    9(19)/9(20) -> 9 bytes, 9(37) -> 16)."""
    if digits <= 4:
        return 2
    if digits <= 9:
        return 4
    if digits <= 18:
        return 8
    return math.ceil((math.ceil(digits * math.log2(10)) + 1) / 8)


def _field_size(f: Field) -> int:
    if f.usage == "comp1":
        return 4
    if f.usage == "comp2":
        return 8
    if f.pic is None:
        raise CopybookError(f"Elementary item {f.name} has no PIC")
    if f.pic.kind == "alpha":
        return f.pic.char_size
    if f.usage == "comp3":
        return f.pic.digits // 2 + 1
    if f.usage == "comp":
        return _binary_size(f.pic.digits)
    # DISPLAY numeric: picture chars + a separate sign byte when requested
    return f.pic.char_size + (1 if f.sign_separate else 0)


def _layout(group: Field) -> int:
    """Assign offsets/sizes depth-first. REDEFINES shares the redefined
    sibling's offset; the group's extent covers the longest overlay."""
    cursor = group.offset
    end = group.offset
    by_name: dict[str, Field] = {}
    for f in group.children:
        if f.redefines:
            target = by_name.get(f.redefines)
            if target is None:
                raise CopybookError(f"{f.name} REDEFINES unknown {f.redefines}")
            f.offset = target.offset
        else:
            f.offset = cursor
        if f.is_group:
            _layout(f)
        else:
            f.size = _field_size(f)
        this_end = f.offset + f.extent
        if not f.redefines:
            cursor = this_end
        end = max(end, this_end)
        by_name[f.name] = f
    group.size = end - group.offset
    return group.size


# ---------------------------------------------------- OCCURS DEPENDING ON


def find_odos(root: Field) -> list[tuple[Field, Field]]:
    """Locate every ``OCCURS ... DEPENDING ON`` field with its counter
    item, in layout (offset) order; [] when the copybook has no ODO.

    Supported envelope (raises CopybookError outside it): a
    single-01-variant copybook; each ODO item sits outside any repeating
    group; each counter is an elementary non-array item laid out at a
    fixed offset BEFORE its variable array (the universal mainframe
    convention — the reader must know the count before it can frame the
    record), and its name is unambiguous (duplicate item names in
    different groups — legal in COBOL with qualification — would
    silently bind the counter to the wrong field and misframe every
    record). Cobrix exposes the same variable-length surface via its
    VarLenReader config (ref CobolFileReader.java:47-92)."""
    odos: list[Field] = []
    by_name: dict[str, list[tuple[Field, bool]]] = {}

    def walk(f: Field, in_array: bool) -> None:
        for ch in f.children:
            ch_in_array = in_array or bool(ch.occurs)
            if ch.depending_on:
                if in_array:
                    raise CopybookError(
                        "OCCURS DEPENDING ON inside a repeating group is "
                        "not supported"
                    )
                odos.append(ch)
            by_name.setdefault(ch.name, []).append((ch, in_array))
            if ch.is_group:
                walk(ch, ch_in_array)

    walk(root, False)
    if not odos:
        return []
    if len(root.children) > 1:
        raise CopybookError(
            "OCCURS DEPENDING ON with multiple 01-level record variants is "
            "not supported"
        )
    out: list[tuple[Field, Field]] = []
    for odo in sorted(odos, key=lambda f: f.offset):
        cands = by_name.get(odo.depending_on, [])
        if not cands:
            raise CopybookError(
                f"OCCURS DEPENDING ON references unknown item "
                f"{odo.depending_on!r}"
            )
        if len(cands) > 1:
            raise CopybookError(
                f"DEPENDING ON counter name {odo.depending_on!r} is "
                f"ambiguous ({len(cands)} items share it); qualified "
                "counters are not supported — rename the items"
            )
        counter, counter_in_array = cands[0]
        if counter.is_group or counter.occurs or counter_in_array:
            raise CopybookError(
                "DEPENDING ON counter must be an elementary, non-repeating item"
            )
        if counter.offset >= odo.offset:
            raise CopybookError(
                "DEPENDING ON counter must be laid out before the variable array"
            )
        out.append((odo, counter))
    return out


def find_odo(root: Field) -> tuple[Field, Field] | None:
    """Single-ODO convenience over find_odos(): None when the copybook
    has no ODO, the (array, counter) pair when it has exactly one."""
    odos = find_odos(root)
    if not odos:
        return None
    if len(odos) > 1:
        raise CopybookError(
            "find_odo: copybook has multiple OCCURS DEPENDING ON items; "
            "use find_odos"
        )
    return odos[0]


def specialize_odo(root: Field, count: int | tuple | list) -> Field:
    """A deep copy of the tree with each ODO array fixed at its count
    (one int for the single-ODO case, a sequence aligned with
    ``find_odos`` order for multiple arrays) and the layout recomputed —
    fields AFTER an array shift left, exactly how a variable-length
    mainframe record compacts on disk. ``count==0`` removes that array
    entirely. The copy's flattened leaf names are a subset of the
    max-occurrence names (indexing is positional), so per-count decodes
    union cleanly."""
    import copy as _copy

    counts = [count] if isinstance(count, int) else list(count)
    r = _copy.deepcopy(root)

    located: list[tuple[Field, Field]] = []  # (parent, odo-child)

    def locate(parent: Field) -> None:
        for ch in parent.children:
            if ch.depending_on:
                located.append((parent, ch))
            if ch.is_group:
                locate(ch)

    locate(r)
    if not located:
        raise CopybookError("specialize_odo: no OCCURS DEPENDING ON item")
    located.sort(key=lambda pf: pf[1].offset)  # find_odos order
    if len(located) != len(counts):
        raise CopybookError(
            f"specialize_odo: {len(counts)} counts for {len(located)} "
            "OCCURS DEPENDING ON items"
        )
    removed = False
    for (parent, f), c in zip(located, counts):
        if c <= 0:
            parent.children.remove(f)
            removed = True
        else:
            f.occurs = int(c)
            f.depending_on = None
    if removed:
        # removing an array can leave childless ex-GROUPS, which _layout
        # would reject as elementary-without-PIC — prune them. is_group is
        # derived from children, so an emptied group reads as a leaf: the
        # tell is "no children AND no PIC" (COMP-1/2 legally omit PIC)
        def prune(g: Field) -> None:
            kept = []
            for c in g.children:
                if c.children:
                    prune(c)
                if not c.children and c.pic is None and c.usage not in ("comp1", "comp2"):
                    continue
                kept.append(c)
            g.children = kept

        prune(r)
    for top in r.children:
        top.offset = 0
        if top.is_group:
            _layout(top)
        else:
            top.size = _field_size(top)
    r.size = max((c.offset + c.extent for c in r.children), default=0)
    return r


def decode_records_odo(
    records: np.ndarray,
    root: Field,
    *,
    ebcdic: bool = True,
    trim: str = "both",
    floating_point_format: str = "ibm",
    debug: bool = False,
    e2a: np.ndarray | None = None,
) -> pd.DataFrame:
    """Decode variable-layout (OCCURS DEPENDING ON) records.

    Rows are grouped by their decoded counter-value VECTOR (one count
    per ODO array, in layout order) and each group decodes against the
    layout specialized to those counts — fields after an array sit at
    compacted offsets, exactly as written on disk. A counter that sits
    AFTER an earlier variable array is itself at a shifted offset, so
    counters decode left-to-right with the cumulative per-row shift
    applied. Work stays numpy-vectorized per distinct count vector,
    never per record. Occurrences beyond a row's count (and their debug
    columns) come back null; output columns and order equal the
    max-occurrence flatten."""
    from dataclasses import replace as _dc_replace

    odos = find_odos(root)
    if not odos:
        raise CopybookError("decode_records_odo: no OCCURS DEPENDING ON item")
    static_leaves = flatten(root)
    counter_leaves = [
        next(l for l in static_leaves if l.f is counter) for _, counter in odos
    ]
    col_order: list[str] = []
    for l in static_leaves:
        col_order.append(l.flat)
        if debug:
            col_order.append(l.flat + "__debug")
    if records.shape[0] == 0:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in col_order})
    n = records.shape[0]
    counts = np.zeros((n, len(odos)), dtype=np.int64)
    for j, ((odo, _), cleaf) in enumerate(zip(odos, counter_leaves)):
        # arrays laid out before this counter shift its position left
        affect = [i for i in range(j) if odos[i][0].offset < cleaf.offset]
        sh = np.zeros(n, dtype=np.int64)
        for i in affect:
            sh += (odos[i][0].occurs - counts[:, i]) * odos[i][0].size
        for s in np.unique(sh):
            rows = np.nonzero(sh == s)[0]
            leaf_s = _dc_replace(cleaf, offset=cleaf.offset - int(s))
            cvals = decode_records(
                records[rows], [leaf_s], ebcdic=ebcdic, trim=trim,
                floating_point_format=floating_point_format, e2a=e2a,
            )[cleaf.flat]
            counts[rows, j] = (
                pd.to_numeric(cvals, errors="coerce")
                .fillna(0)
                .clip(0, odo.occurs)
                .astype(np.int64)
                .to_numpy()
            )
    uniq, inv = np.unique(counts, axis=0, return_inverse=True)
    parts: list[pd.DataFrame] = []
    idxs: list[np.ndarray] = []
    for gi, vec in enumerate(uniq):
        rows = np.nonzero(inv == gi)[0]
        sub_leaves = flatten(specialize_odo(root, [int(x) for x in vec]))
        pdf = decode_records(
            records[rows], sub_leaves, ebcdic=ebcdic, trim=trim,
            floating_point_format=floating_point_format, debug=debug, e2a=e2a,
        )
        for col in col_order:
            if col not in pdf.columns:
                # object dtype, not all-NA float: keeps pd.concat dtype
                # resolution deterministic across pandas versions
                pdf[col] = pd.Series([None] * len(pdf), dtype=object)
        parts.append(pdf[col_order])
        idxs.append(rows)
    import warnings

    with warnings.catch_warnings():
        # beyond-count occurrence columns are intentionally all-NA in
        # some groups; pandas' dtype-resolution FutureWarning for that
        # case is expected and the object dtype pins the behavior
        warnings.simplefilter("ignore", FutureWarning)
        out = pd.concat(parts, ignore_index=True)
    perm = np.argsort(np.concatenate(idxs), kind="stable")
    return out.iloc[perm].reset_index(drop=True)


# ------------------------------------------------------------------ flatten


@dataclass
class Leaf:
    """A flattened primitive: decode source (offset/size/shape) plus the
    struct path used to reassemble nesting ([(name, occurs_index|None)])."""

    path: tuple[tuple[str, int | None], ...]
    flat: str
    f: Field
    offset: int


def flatten(root: Field) -> list[Leaf]:
    leaves: list[Leaf] = []

    def walk(f: Field, base: int, path: tuple) -> None:
        reps = range(f.occurs) if f.occurs else (None,)
        for idx in reps:
            start = base + (idx or 0) * f.size
            p = path + ((f.name, idx),)
            if f.is_group:
                for c in f.children:
                    walk(c, start + (c.offset - f.offset), p)
            elif f.is_filler:
                # FILLER occupies layout bytes but is NOT output (Cobrix
                # drops value fillers too); FILLER groups with named
                # children ARE walked above under their unique FILLER_n
                # path segment
                pass
            else:
                flat = "__".join(
                    n if i is None else f"{n}_{i}" for n, i in p
                ).lower()
                leaves.append(Leaf(path=p, flat=flat, f=f, offset=start))

    for top in root.children:
        walk(top, top.offset, ())
    return leaves


def spark_type_for(f: Field) -> str:
    """The reference's Connect-schema mapping (CobolFileReader.java:
    schemaForField): integral by precision -> int32/int64/float64;
    decimal -> float64 (COMP-1 float32); character -> string."""
    if f.usage == "comp1":
        return "float"
    if f.usage == "comp2":
        return "double"
    pic = f.pic
    if pic is None or pic.kind == "alpha":
        return "string"
    if pic.scale or pic.edited:
        return "double"
    if pic.digits <= 9:
        return "int"
    if pic.digits <= 18:
        return "long"
    return "double"


# ------------------------------------------------------------------ decoding

_EBCDIC = "cp037"  # Cobrix's "common" EBCDIC code page


def ebcdic_to_ascii_table(codec: str = _EBCDIC) -> np.ndarray:
    tbl = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        ch = bytes([b]).decode(codec, errors="replace")
        o = ord(ch)
        tbl[b] = o if o < 128 else ord("?")
    return tbl


_E2A = ebcdic_to_ascii_table()


def _slice(m: np.ndarray, off: int, size: int) -> np.ndarray:
    return m[:, off : off + size]


def _strings(m: np.ndarray, leaf: Leaf, ebcdic: bool, trim: str, e2a: np.ndarray) -> pd.Series:
    sl = np.ascontiguousarray(_slice(m, leaf.offset, leaf.f.size))
    if ebcdic:
        sl = e2a[sl]
    raw = sl.view(f"S{leaf.f.size}").ravel()
    s = pd.Series(raw).str.decode("ascii", errors="replace")
    s = s.str.replace("\x00", " ", regex=False)
    if trim == "both":
        s = s.str.strip()
    elif trim == "left":
        s = s.str.lstrip()
    elif trim == "right":
        s = s.str.rstrip()
    return s


def _display_number(m: np.ndarray, leaf: Leaf, ebcdic: bool, e2a: np.ndarray) -> pd.Series:
    f = leaf.f
    pic = f.pic
    sl = _slice(m, leaf.offset, f.size)
    if pic.edited or f.sign_separate or not ebcdic:
        # string-parse path: editing characters, separate signs, ASCII data
        a = e2a[sl] if ebcdic else sl
        raw = pd.Series(np.ascontiguousarray(a).view(f"S{f.size}").ravel())
        txt = raw.str.decode("ascii", errors="replace").str.strip()
        # editing/insertion characters: CR/DB suffix marks negative; then
        # strip currency/fill/insertion chars (B prints as blank) so the
        # remaining digit string parses
        if pic.edited:
            crdb = txt.str.endswith("CR") | txt.str.endswith("DB")
            txt = txt.str.replace(r"(CR|DB)$", "", regex=True)
            txt = txt.str.replace(r"[,$*/ ]", "", regex=True)
        # trailing sign -> leading; zoned overpunch inside edited pics was
        # already translated to a letter by the char decode: map it back
        txt = txt.map(_fix_overpunch_text)
        trail = txt.str[-1:].isin(["+", "-"])
        if trail.any():
            txt = txt.where(
                ~trail, txt.str[-1:].where(txt.str[-1:] == "-", "") + txt.str[:-1]
            )
        if not pic.scale and "." not in pic.raw:
            # integer pictures: parse through python int, NOT to_numeric —
            # one unparseable row in the batch coerces to float64 and
            # silently rounds 16-18 digit values above 2**53
            def _int_or_none(s):
                try:
                    return int(s)
                except (TypeError, ValueError):
                    return None

            vals = pd.array([_int_or_none(s) for s in txt], dtype="Int64")
            vals = pd.Series(vals)
            if pic.edited:
                vals = vals.where(~crdb, -vals)
            return vals
        vals = pd.to_numeric(txt, errors="coerce")
        if pic.edited:
            vals = vals.where(~crdb, -vals)
        if pic.scale and "." not in pic.raw:
            vals = vals / (10.0 ** pic.scale)
        return vals
    # pure zoned decimal: digit nibbles + sign zone, fully vectorized
    digits = (sl & 0x0F).astype(np.int64)
    zones = sl >> 4
    n = pic.digits
    valid = (digits <= 9).all(axis=1)
    sign_col = 0 if (f.sign_clause and f.sign_leading) else n - 1
    sz = zones[:, sign_col]
    neg = (sz == 0xD) | (sz == 0xB)
    zone_ok = np.ones(len(sl), dtype=bool)
    for j in range(n):
        zj = zones[:, j]
        if j == sign_col and pic.signed:
            zone_ok &= (zj == 0xF) | (zj == 0xC) | (zj == 0xD) | (zj == 0xB) | (zj == 0xA) | (zj == 0xE)
        else:
            zone_ok &= zj == 0xF
    if n <= 18:
        pows = (10 ** np.arange(n - 1, -1, -1)).astype(np.int64)
        vals = digits @ pows
    else:
        pows = 10.0 ** np.arange(n - 1, -1, -1)
        vals = digits.astype(np.float64) @ pows
    vals = np.where(neg, -vals, vals)
    out: pd.Series
    if pic.scale:
        out = pd.Series(vals / (10.0 ** pic.scale), dtype="float64")
    elif n > 18:
        out = pd.Series(vals, dtype="float64")
    else:
        out = pd.Series(vals).astype("Int64" if n > 9 else "Int32")
    out[~(valid & zone_ok)] = None
    return out


_OVERPUNCH = {
    **{chr(ord("A") + i): (i + 1, 1) for i in range(9)},  # A-I = +1..+9
    **{chr(ord("J") + i): (i + 1, -1) for i in range(9)},  # J-R = -1..-9
    "{": (0, 1),
    "}": (0, -1),
}


def _fix_overpunch_text(s):
    if not isinstance(s, str) or not s:
        return s
    last = s[-1]
    if last in _OVERPUNCH:
        d, sign = _OVERPUNCH[last]
        return ("-" if sign < 0 else "") + s[:-1] + str(d)
    return s


def _binary(m: np.ndarray, leaf: Leaf) -> pd.Series:
    f = leaf.f
    pic = f.pic
    size = f.size
    sl = np.ascontiguousarray(_slice(m, leaf.offset, size))
    # out-of-precision -> null (the reference's Cobrix returns null when a
    # binary value exceeds its picture's digits; CobolFileReaderTest
    # expects the REDEFINES misread TAXPAYER_NUM to be null).
    # The precision check runs in the RAW dtype domain BEFORE any int64
    # cast: an unsigned 8-byte value >= 2**63 would wrap negative under
    # astype(int64) and np.abs would overflow right past the check.
    if size in (2, 4, 8):
        dt = {2: ">i2", 4: ">i4", 8: ">i8"}[size] if pic.signed else {2: ">u2", 4: ">u4", 8: ">u8"}[size]
        raw = sl.view(dt).ravel()
        if pic.digits > 18:
            vals = raw.astype(np.float64)
            bad = np.abs(vals) >= float(10 ** pic.digits)
        else:
            limit = 10 ** pic.digits  # <= 10^18: fits int64 AND uint64
            if pic.signed:
                bad = (raw >= limit) | (raw <= -limit)
            else:
                bad = raw >= np.uint64(limit)
            vals = np.where(bad, 0, raw).astype(np.int64)
    else:
        vals = np.array(
            [
                float(int.from_bytes(bytes(r), "big", signed=pic.signed))
                for r in sl
            ],
            dtype=np.float64,
        )
        bad = np.abs(vals) >= float(10 ** pic.digits)
    vals = np.where(bad, 0, vals)
    if pic.scale:
        out = pd.Series(vals / (10.0 ** pic.scale), dtype="float64")
    elif pic.digits > 18:
        out = pd.Series(vals, dtype="float64")
    else:
        out = pd.Series(vals).astype("Int64" if pic.digits > 9 else "Int32")
    out[bad] = None
    return out


def _packed(m: np.ndarray, leaf: Leaf) -> pd.Series:
    f = leaf.f
    pic = f.pic
    size = f.size
    sl = _slice(m, leaf.offset, size)
    hi = (sl >> 4).astype(np.int64)
    lo = (sl & 0x0F).astype(np.int64)
    # interleave -> (n, 2*size) digit matrix; last nibble is the sign
    nibbles = np.empty((sl.shape[0], size * 2), dtype=np.int64)
    nibbles[:, 0::2] = hi
    nibbles[:, 1::2] = lo
    sign = nibbles[:, -1]
    digits = nibbles[:, -(pic.digits + 1) : -1]
    valid = (digits <= 9).all(axis=1) & (sign >= 0xA)
    neg = (sign == 0xD) | (sign == 0xB)
    if pic.digits <= 18:
        pows = (10 ** np.arange(pic.digits - 1, -1, -1)).astype(np.int64)
        vals = digits @ pows
    else:
        vals = digits.astype(np.float64) @ (10.0 ** np.arange(pic.digits - 1, -1, -1))
    vals = np.where(neg, -vals, vals)
    if pic.scale:
        out = pd.Series(vals / (10.0 ** pic.scale), dtype="float64")
    elif pic.digits > 18:
        out = pd.Series(vals, dtype="float64")
    else:
        out = pd.Series(vals).astype("Int64" if pic.digits > 9 else "Int32")
    out[~valid] = None
    return out


def _float(m: np.ndarray, leaf: Leaf, fmt: str) -> pd.Series:
    size = leaf.f.size
    sl = np.ascontiguousarray(_slice(m, leaf.offset, size))
    if fmt == "ieee754":
        vals = sl.view(">f4" if size == 4 else ">f8").ravel()
        return pd.Series(vals, dtype="float32" if size == 4 else "float64")
    # IBM System/360 hexadecimal floating point (public format): 1 sign
    # bit, 7-bit excess-64 base-16 exponent, 24/56-bit fraction
    b0 = sl[:, 0].astype(np.int64)
    sign = np.where(b0 & 0x80, -1.0, 1.0)
    expo = (b0 & 0x7F) - 64
    frac = np.zeros(len(sl), dtype=np.float64)
    for j in range(1, size):
        frac += sl[:, j].astype(np.float64) / (256.0 ** j)
    vals = sign * frac * np.power(16.0, expo)
    return pd.Series(vals, dtype="float32" if size == 4 else "float64")


def _debug_hex(m: np.ndarray, leaf: Leaf) -> pd.Series:
    sl = np.ascontiguousarray(_slice(m, leaf.offset, leaf.f.size))
    raw = sl.view(f"V{leaf.f.size}").ravel()
    return pd.Series([bytes(v).hex() for v in raw], dtype="object")


def encode_records(
    rows: list[dict],
    root: Field,
    *,
    codec: str = _EBCDIC,
) -> bytes:
    """Encode dict rows into fixed-length mainframe records — the write
    half the reference never had (Cobrix is read-only there). Fixture
    synthesis and round-trip testing, not a bulk-write path: driver-side,
    per-value Python. Keys are the flattened lower-case leaf names
    (``record__field``) or bare leaf names; missing values write spaces /
    zero. Supports DISPLAY alpha + zoned numerics, COMP binary and COMP-3
    packed decimal."""
    leaves = flatten(root)
    lrecl = max(c.offset + c.extent for c in root.children)
    out = bytearray()
    for row in rows:
        rec = bytearray(" ".encode(codec) * lrecl)
        for leaf in leaves:
            f = leaf.f
            pic = f.pic
            has_key = leaf.flat in row or leaf.f.name.lower() in row
            v = row.get(leaf.flat, row.get(leaf.f.name.lower()))
            if f.redefines and not has_key:
                # an absent REDEFINES overlay must not clobber the
                # redefined sibling's already-written bytes with defaults
                continue
            if f.usage in ("comp1", "comp2"):
                raise CopybookError("encode_records does not support COMP-1/2")
            if pic and pic.kind == "num":
                if v is None:
                    iv = 0
                elif isinstance(v, int):
                    # keep int arithmetic exact: float(v) would round
                    # integers above 2**53; a NEGATIVE scale (trailing P)
                    # divides — in int arithmetic, not float (which would
                    # leave a decimal point in the digit string)
                    if pic.scale >= 0:
                        iv = v * (10 ** pic.scale)
                    else:
                        iv = int(v) // (10 ** -pic.scale)
                else:
                    iv = int(round(float(v) * (10.0 ** pic.scale)))
                if f.usage == "comp3":
                    a = abs(iv)
                    ds = str(a).rjust(pic.digits, "0")[-pic.digits :]
                    if len(ds) % 2 == 0:
                        ds = "0" + ds
                    nib = [int(c) for c in ds] + [0xD if iv < 0 else 0xC]
                    raw = bytes(
                        (nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2)
                    )
                elif f.usage == "comp":
                    raw = int(iv).to_bytes(f.size, "big", signed=True)
                else:  # zoned decimal
                    a = abs(iv)
                    ds = str(a).rjust(pic.digits, "0")[-pic.digits :]
                    raw = bytearray(ds.encode(codec))
                    if pic.signed:
                        raw[-1] = (0xD0 if iv < 0 else 0xC0) | (a % 10)
                    raw = bytes(raw)
            else:
                s = "" if v is None else str(v)
                raw = s.ljust(f.size)[: f.size].encode(codec, errors="replace")
            rec[leaf.offset : leaf.offset + len(raw)] = raw
        out += rec
    return bytes(out)


def decode_records(
    records: np.ndarray,
    leaves: list[Leaf],
    *,
    ebcdic: bool = True,
    trim: str = "both",
    floating_point_format: str = "ibm",
    debug: bool = False,
    e2a: np.ndarray | None = None,
) -> pd.DataFrame:
    """Decode an (n_records x lrecl) uint8 matrix into a flat DataFrame,
    one column per Leaf (plus <flat>__debug hex columns when debug).
    ``e2a`` is the EBCDIC->ASCII translate table (defaults to cp037,
    Cobrix's "common"); build one for another code page with
    ebcdic_to_ascii_table()."""
    if e2a is None:
        e2a = _E2A
    cols: dict[str, pd.Series] = {}
    for leaf in leaves:
        f = leaf.f
        if f.usage == "comp1" or f.usage == "comp2":
            s = _float(records, leaf, floating_point_format)
        elif f.usage == "comp3":
            s = _packed(records, leaf)
        elif f.usage == "comp":
            s = _binary(records, leaf)
        elif f.pic and f.pic.kind == "num":
            s = _display_number(records, leaf, ebcdic, e2a)
        else:
            s = _strings(records, leaf, ebcdic, trim, e2a)
        cols[leaf.flat] = s
        if debug:
            cols[leaf.flat + "__debug"] = _debug_hex(records, leaf)
    return pd.DataFrame(cols)
