"""Enrich stage — lookup joins + attribute mutation actions.

Reference semantics:
- lookupprocessor: key expr per record → Lookup(key) → write fields,
  ``default`` on miss — processor/lookupprocessor/processor.go:46-105,
  209-237.
- geoipprocessor: ip → geo.* attributes —
  processor/geoipprocessor/geoip_processor.go:57-126.
- attraction actions (insert/update/upsert/delete/hash/extract/convert)
  — internal/coreinternal/attraction/attraction.go:304-368,449-469.

Spark-first: every lookup is a **broadcast hash left-outer join** — the
lookup tables are small dims; marking them ``F.broadcast`` removes the
shuffle entirely, which is what keeps this stage linear at 10^12 rows.
Defaults are ``coalesce`` after the join (miss → default, exactly the
lookup processor's miss path).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_enrich(
    df: DataFrame,
    lookup: DataFrame,
    key: str,
    lookup_key: str | None = None,
    fields: Mapping[str, str] | None = None,
    defaults: Mapping[str, object] | None = None,
) -> DataFrame:
    """Broadcast left-outer lookup join with per-field miss defaults.

    ``fields`` maps lookup-column → output-column (None = take all
    non-key columns under their own names).  A missing key yields the
    field's default (processor/lookupprocessor/processor.go:209-237);
    fields without a default stay NULL, mirroring `add_miss_as_empty`
    off.
    """
    lk = lookup_key or key
    if fields is None:
        fields = {c: c for c in lookup.columns if c != lk}
    sel = [F.col(lk).alias("_lk")] + [F.col(src).alias(f"_v_{dst}") for src, dst in fields.items()]
    dim = lookup.select(*sel)
    out = df.join(F.broadcast(dim), on=df[key] == dim["_lk"], how="left").drop("_lk")
    defaults = defaults or {}
    for src, dst in fields.items():
        c: Column = F.col(f"_v_{dst}")
        if dst in defaults:
            c = F.coalesce(c, F.lit(defaults[dst]))
        out = out.withColumn(dst, c).drop(f"_v_{dst}")
    return out


# ---------------------------------------------------------------------------
# geoip CIDR range semantics (SURVEY §2.5 escalation path)
# ---------------------------------------------------------------------------


def ipv4_long(col: Column) -> Column:
    """Dotted-quad IPv4 string → its 32-bit value in a bigint.

    Malformed input (wrong part count, non-numeric or out-of-range
    octets) → NULL, which falls through every CIDR join to the miss
    default — the reference's not-an-IP skip path
    (processor/geoipprocessor/geoip_processor.go:83-90)."""
    p = F.split(col, r"\.")
    # F.get (not [i]): out-of-bounds → NULL instead of an ANSI error
    octs = [F.get(p, i).try_cast("bigint") for i in range(4)]
    ok = F.size(p) == 4
    for o in octs:
        ok = ok & o.isNotNull() & (o >= 0) & (o <= 255)
    v = octs[0] * 16777216 + octs[1] * 65536 + octs[2] * 256 + octs[3]
    return F.when(ok, v)


def geoip_cidr_enrich(
    df: DataFrame,
    cidr_df: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
    defaults: Mapping[str, object] | None = None,
) -> DataFrame:
    """Resolve an IP *within* a CIDR block, longest prefix wins — the
    mmdb lookup semantics of the reference's geoipprocessor
    (processor/geoipprocessor/geoip_processor.go:57-126), where exact
    host keys (``lookup_enrich``) are insufficient.

    Spark-first: NOT a ``BETWEEN lo AND hi`` theta join (that plans as
    a BroadcastNestedLoopJoin — O(rows × blocks), a scale killer for a
    real mmdb with millions of blocks).  Instead, one **broadcast hash
    equi-join per distinct prefix length**: for prefix length ``p`` the
    join key is ``ip >> (32-p)`` on both sides, so each join is a plain
    BroadcastHashJoin and the fact side never shuffles.  Longest prefix
    wins by coalescing the per-length matches most-specific-first.  The
    distinct-length collect is metadata-sized (≤ 33 values for IPv4 —
    a hard bound, not an assumption).

    ``cidr_df``: one row per block — ``cidr_col`` like ``"10.0.0.0/24"``
    plus attribute columns; duplicate (plen, net) blocks are reduced
    deterministically (min struct) before broadcasting.
    """
    attr_cols = [c for c in cidr_df.columns if c != cidr_col]
    parts = F.split(F.col(cidr_col), "/")
    dim = cidr_df.select(
        parts[1].cast("int").alias("_plen"),
        ipv4_long(parts[0]).alias("_net"),
        F.struct(*[F.col(c) for c in attr_cols]).alias("_attrs"),
    )
    plens = sorted(
        r["_plen"]
        for r in dim.select("_plen").distinct().collect()
        if r["_plen"] is not None and 0 <= r["_plen"] <= 32
    )  # ≤ 33 rows: IPv4 prefix lengths are 0..32; out-of-range blocks
    # (a "/40" typo) are skipped like the reference skips unparseable
    # networks — without this, Java's shift-amount & 63 semantics would
    # collapse both join keys to 0 and the bad block would match every IP
    out = df.withColumn("_ip_long", ipv4_long(F.col(ip_col)))
    for p in plens:
        # aligned network key at this prefix length; the shift also
        # normalizes an unaligned cidr spec the way mmdb tooling does
        blocks = (
            dim.filter(F.col("_plen") == p)
            .withColumn("_key", F.shiftrightunsigned(F.col("_net"), 32 - p))
            .groupBy("_key")
            .agg(F.min("_attrs").alias(f"_g{p}"))
        )
        out = out.join(
            F.broadcast(blocks),
            on=F.shiftrightunsigned(F.col("_ip_long"), 32 - p) == blocks["_key"],
            how="left",
        ).drop("_key")
    defaults = defaults or {}
    attr_types = {f.name: f.dataType for f in dim.schema["_attrs"].dataType.fields}
    for c in attr_cols:
        cands = [F.col(f"_g{p}")[c] for p in reversed(plens)]  # most specific first
        if c in defaults:
            cands.append(F.lit(defaults[c]))
        if not cands:
            # zero valid prefix lengths (empty CIDR table, or every block
            # skipped as unparseable) and no default: all-miss enrichment,
            # typed like the attribute column — mirrors the reference
            # skipping unparseable networks rather than erroring the job
            cands = [F.lit(None).cast(attr_types[c])]
        out = out.withColumn(c, F.coalesce(*cands))
    return out.drop("_ip_long", *[f"_g{p}" for p in plens])


# ---------------------------------------------------------------------------
# attraction actions (attributesprocessor / resourceprocessor core)
# ---------------------------------------------------------------------------


def attr_insert(df: DataFrame, key: str, value: Column) -> DataFrame:
    """insert: set only if absent (attraction.go:304-311) — on promoted
    columns 'absent' means NULL."""
    if key in df.columns:
        return df.withColumn(key, F.coalesce(F.col(key), value))
    return df.withColumn(key, value)


def attr_update(df: DataFrame, key: str, value: Column) -> DataFrame:
    """update: set only if present (attraction.go:313-319)."""
    if key not in df.columns:
        return df
    return df.withColumn(key, F.when(F.col(key).isNotNull(), value))


def attr_upsert(df: DataFrame, key: str, value: Column) -> DataFrame:
    """upsert: always set (attraction.go:321-324)."""
    return df.withColumn(key, value)


def attr_delete(df: DataFrame, keys: Sequence[str] = (), key_pattern: str | None = None) -> DataFrame:
    """delete by name and/or key regex (attraction.go:326-340)."""
    drop = [c for c in df.columns if c in set(keys)]
    if key_pattern is not None:
        import re

        pat = re.compile(key_pattern)
        drop += [c for c in df.columns if pat.fullmatch(c) and c not in drop]
    return df.drop(*drop)


def attr_hash(df: DataFrame, key: str) -> DataFrame:
    """hash: SHA-256 the value in place (attraction.go:350-361, hasher.go)."""
    return df.withColumn(key, F.sha2(F.col(key).cast("string"), 256))


def attr_extract(df: DataFrame, key: str, pattern: str, groups: Sequence[str]) -> DataFrame:
    """extract: regex named groups from value → new keys (attraction.go:449-469)."""
    for i, g in enumerate(groups):
        df = df.withColumn(g, F.regexp_extract(F.col(key), pattern, i + 1))
    return df


def attr_convert(df: DataFrame, key: str, to: str) -> DataFrame:
    """convert: cast, leave original on failure (type_converter.go)."""
    casted = F.col(key).try_cast(to)
    return df.withColumn(key, F.coalesce(casted, F.col(key).cast(to)) if to == "string" else casted)


def apply_actions(df: DataFrame, actions: Sequence[Mapping]) -> DataFrame:
    """Ordered action list, the attributesprocessor contract."""
    for a in actions:
        op = a["action"]
        if op == "insert":
            df = attr_insert(df, a["key"], a["value"])
        elif op == "update":
            df = attr_update(df, a["key"], a["value"])
        elif op == "upsert":
            df = attr_upsert(df, a["key"], a["value"])
        elif op == "delete":
            df = attr_delete(df, a.get("keys", ()), a.get("pattern"))
        elif op == "hash":
            df = attr_hash(df, a["key"])
        elif op == "extract":
            df = attr_extract(df, a["key"], a["pattern"], a["groups"])
        elif op == "convert":
            df = attr_convert(df, a["key"], a["to"])
        else:
            raise ValueError(f"unknown action {op!r}")
    return df
