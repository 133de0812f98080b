"""Natural-join family: Andl's dyadic join operators, Spark-first.

Reference semantics: Andl joins are *natural* — matched on every
common-named attribute — and each variant keeps a different column
subset of the joined heading (reference Test/SuiteRelDyadic.andl:14-48
fixes the full count/degree matrix; engine in
Andl.Runtime/DataTableLocal.cs).

Spark mapping: one declarative ``df.join`` per operator so Catalyst
chooses broadcast-hash vs sort-merge (AQE can demote/promote at
runtime). Semijoin/antijoin use Spark's dedicated ``leftsemi`` /
``leftanti`` join types, which never materialize right-side columns —
exactly the 100 TB-friendly physical plan. Relational (set) semantics:
projections that drop columns apply ``dropDuplicates`` to stay
faithful to Andl's set-of-tuples model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def common_columns(left: DataFrame, right: DataFrame) -> list[str]:
    """Attributes shared by name — the natural-join key."""
    rcols = set(right.columns)
    return [c for c in left.columns if c in rcols]


def _maybe_broadcast(df: DataFrame, hint: bool) -> DataFrame:
    return F.broadcast(df) if hint else df


def natural_join(
    left: DataFrame,
    right: DataFrame,
    keep: str = "all",
    broadcast_right: bool = False,
    set_semantics: bool = True,
) -> DataFrame:
    """Natural inner join; ``keep`` selects the output heading.

    keep ∈ {"all", "left", "right", "leftc", "cr", "lr"}:
      all   → L ∪ R columns          (Andl `join`)
      lr    → non-common of both     (Andl `compose` / `joinlr`)
      left  → left-only columns      (Andl `joinl`)
      leftc → left incl. common      (Andl `joinlc` — pure semijoin)
      right → right-only columns     (Andl `joinr`)
      cr    → common + right-only    (Andl `joincr`)
    """
    common = common_columns(left, right)
    if not common:
        return left.crossJoin(_maybe_broadcast(right, broadcast_right))
    if keep == "leftc":
        # Pure semijoin: Spark never shuffles right-side payload columns.
        return left.join(_maybe_broadcast(right, broadcast_right), on=common, how="leftsemi")
    joined = left.join(_maybe_broadcast(right, broadcast_right), on=common, how="inner")
    left_only = [c for c in left.columns if c not in common]
    right_only = [c for c in right.columns if c not in common]
    if keep == "all":
        return joined
    subset = {
        "lr": left_only + right_only,
        "left": left_only,
        "right": right_only,
        "cr": common + right_only,
    }[keep]
    out = joined.select(*subset)
    return out.dropDuplicates() if set_semantics else out


def compose(left: DataFrame, right: DataFrame, **kw) -> DataFrame:
    """Andl `compose`: natural join keeping only non-common columns."""
    return natural_join(left, right, keep="lr", **kw)


def semijoin(left: DataFrame, right: DataFrame, broadcast_right: bool = False) -> DataFrame:
    """Andl `joinlc`: rows of *left* with a natural match in *right*."""
    return natural_join(left, right, keep="leftc", broadcast_right=broadcast_right)


def antijoin(left: DataFrame, right: DataFrame, broadcast_right: bool = False) -> DataFrame:
    """Andl `ajoin`: rows of *left* with NO natural match in *right*."""
    common = common_columns(left, right)
    if not common:
        raise ValueError("antijoin requires at least one common attribute")
    return left.join(_maybe_broadcast(right, broadcast_right), on=common, how="leftanti")


def antijoin_trimmed(left: DataFrame, right: DataFrame, **kw) -> DataFrame:
    """Andl `ajoinl`: antijoin, then drop the common columns (set)."""
    common = common_columns(left, right)
    out = antijoin(left, right, **kw)
    keep = [c for c in left.columns if c not in common]
    return out.select(*keep).dropDuplicates()
