"""schemaprocessor analogue: semconv schema-version migration.

The reference (processor/schemaprocessor/processor.go) fetches schema
translation files over HTTP and applies per-version attribute renames to
bring every signal to a target semantic-convention version; the rename
engine is internal/migrate/attributes.go (updates map forward, inverse
map for rollback/downgrade, sequential application across the version
chain, renamed-value-wins on conflicts, optional copy mode that keeps
the old name during active migrations).

This variant is DATA-DRIVEN instead of network-bound: the version chain
and rename maps arrive as plan-time config (the same way OTTL statements
do), and the whole translation compiles to native map/array column
expressions — one `when` per revision gated on the record's schema
version, no UDF, no shuffle.  Upgrades apply revisions ascending,
downgrades apply the inverse maps descending, exactly the reference's
iterator order (internal/translation/translation.go:392).

Conflict semantics mirror migrate/attributes.go `Do`: when a rename's
target key already exists on the record, the RENAMED value wins and the
pre-existing entry is dropped (the reference also reports an error when
the values differ; here the drop is silent — per-row errors are not a
column concept — and tests pin the value outcome).  In copy mode the
original key survives and the renamed copy is only written if the
target key is absent (attributes.go:63-69).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_expr(version_col: Column, versions: Sequence[str]) -> Column:
    """version string → ordinal in the configured chain (NULL if unknown)."""
    expr = F.lit(None).cast("int")
    for i, v in enumerate(versions):
        expr = F.when(version_col == v, F.lit(i)).otherwise(expr)
    return expr


def _apply_renames(
    attrs: Column, mapping: Mapping[str, str], copy_attributes: bool
) -> Column:
    """One revision's rename set over a map<string,string> column.

    Rename-vs-existing-key conflicts resolve renamed-wins (non-copy) /
    keep-existing (copy mode), matching the reference's conflict rules.
    Two SOURCE keys renaming to the same target is legal when the
    sources never co-occur in one record (e.g. merging mutually
    exclusive legacy keys); when they DO co-occur, the first entry in
    the record's attribute order wins and the rest are dropped —
    deduped per record below, because duplicate map keys would
    otherwise crash the job under the default
    spark.sql.mapKeyDedupPolicy=EXCEPTION."""
    lm = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    entries = F.map_entries(attrs)

    def newkey(k: Column) -> Column:
        return F.coalesce(F.element_at(lm, k), k)

    # Only a mapping with duplicate TARGETS can make two entries collide
    # post-rename (rename-vs-existing is already resolved by the kept /
    # copies filters), so the per-record dedupe fold is attached only
    # then — revisions without duplicate targets (every realistic chain
    # link) add zero lambda nesting, which matters: stacking folds on
    # every link blows the analyzer's resolution-iteration budget.
    targets = [t for s, t in mapping.items() if s != t]
    needs_dedupe = len(targets) != len(set(targets))

    def first_wins(arr: Column) -> Column:
        # drop entries whose key already appeared earlier: a left fold
        # appending only unseen keys (O(n²) per record over attr maps —
        # tiny).  NOT the indexed-filter + slice(arr, 1, i) form, which
        # re-embeds the whole array expression inside its own lambda.
        if not needs_dedupe:
            return arr
        return F.aggregate(
            arr,
            F.slice(arr, F.lit(1), F.lit(0)),  # empty array, same element type
            lambda acc, e: F.when(
                F.exists(acc, lambda p: p["key"] == e["key"]), acc
            ).otherwise(F.concat(acc, F.array(e))),
        )

    if copy_attributes:
        # keep originals; add a renamed copy unless the target exists
        existing = F.map_keys(attrs)
        copies = F.transform(
            F.filter(
                entries,
                lambda e: (newkey(e["key"]) != e["key"])
                & ~F.array_contains(existing, newkey(e["key"])),
            ),
            lambda e: F.struct(
                newkey(e["key"]).alias("key"), e["value"].alias("value")
            ),
        )
        return F.map_from_entries(first_wins(F.concat(entries, copies)))
    tagged = F.transform(
        entries,
        lambda e: F.struct(
            newkey(e["key"]).alias("key"),
            e["value"].alias("value"),
            (newkey(e["key"]) != e["key"]).alias("renamed"),
        ),
    )
    renamed_keys = F.transform(
        F.filter(tagged, lambda x: x["renamed"]), lambda x: x["key"]
    )
    kept = F.filter(
        tagged,
        lambda x: x["renamed"] | ~F.array_contains(renamed_keys, x["key"]),
    )
    return F.map_from_entries(
        first_wins(
            F.transform(
                kept,
                lambda x: F.struct(x["key"].alias("key"), x["value"].alias("value")),
            )
        )
    )


def schema_transform(
    df: DataFrame,
    versions: Sequence[str],
    revisions: Sequence[tuple[str, Mapping[str, str]]],
    target: str,
    attrs_col: str = "attrs",
    version_col: str = "schema_version",
    copy_attributes: bool = False,
) -> DataFrame:
    """Translate every record's attributes to the ``target`` schema
    version.

    ``versions`` is the full ordered chain (oldest first); each entry in
    ``revisions`` is ``(version, {old_name: new_name})`` — the renames
    that took effect AT that version.  Records already at (or past) a
    revision skip it; records newer than ``target`` roll back through
    inverse maps, descending.  Unknown versions pass through unchanged
    (the reference only translates schema families it recognizes).
    """
    if target not in versions:
        raise ValueError(f"target {target!r} not in versions chain")
    ranks = {v: i for i, v in enumerate(versions)}
    for v, _m in revisions:
        if v not in ranks:
            raise ValueError(f"revision version {v!r} not in versions chain")
    trank = ranks[target]
    vrank = _rank_expr(F.col(version_col), versions)
    attrs = F.col(attrs_col)
    # upgrades: revisions ascending, apply when vrank < rank(X) <= trank
    for v, mapping in sorted(revisions, key=lambda r: ranks[r[0]]):
        x = ranks[v]
        attrs = F.when(
            vrank.isNotNull() & (vrank < x) & (F.lit(x) <= trank),
            _apply_renames(attrs, mapping, copy_attributes),
        ).otherwise(attrs)
    # downgrades: inverse maps descending, apply when trank < rank(X) <= vrank
    for v, mapping in sorted(revisions, key=lambda r: -ranks[r[0]]):
        x = ranks[v]
        inverse = {new: old for old, new in mapping.items()}
        attrs = F.when(
            vrank.isNotNull() & (F.lit(trank) < x) & (F.lit(x) <= vrank),
            _apply_renames(attrs, inverse, copy_attributes),
        ).otherwise(attrs)
    return df.withColumn(attrs_col, attrs).withColumn(
        version_col, F.when(vrank.isNotNull(), F.lit(target)).otherwise(F.col(version_col))
    )
