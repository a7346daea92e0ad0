"""Skew-handling join helpers for 100 TB runs.

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime; ``salted_join`` is the explicit fallback for extreme
hot keys or for engines/stages where AQE cannot rewrite (e.g. a
broadcast side too big to broadcast but with a few whale keys).

Pattern: replicate the small side ``salt`` times, scatter the big side
uniformly across the salt space, join on (key, salt) — hot keys spread
over ``salt`` reducers instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated.

    Returns the joined frame with helper columns dropped. Cost: small
    side inflates x``salt`` (keep it for dimension-sized tables); big
    side gets one extra int column.
    """
    if how in ("right", "right_outer", "full", "full_outer", "outer"):
        # small-side-unmatched rows would surface once per salt replica
        raise ValueError(
            f"salted_join does not support how={how!r}; unmatched small-side "
            "rows would duplicate across salt replicas"
        )
    if salt < 2:
        return big.join(small, big[big_key] == small[small_key], how)
    big_s = big.withColumn("_salt", (F.rand() * salt).cast("int"))
    # explode inline with its array expression (generator-placement
    # rule, operators/text.py): alias-then-explode re-evaluates the
    # generator input — harmless for this constant array, but the
    # pattern should not be copied next to expensive arrays
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key]) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return out.drop("_salt")
