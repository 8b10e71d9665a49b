"""Join strategy helpers for the 100 TB regime.

AQE's skew-join splitting (on in session.py) handles most skew
automatically; ``salted_join`` is the explicit fallback for
pathological hot keys (one key holding a double-digit percentage of
the table), where even a split partition won't fit an executor: the
big side scatters each hot key across ``salt`` sub-partitions and the
small side is replicated ``salt``× — turning one giant task into
``salt`` bounded ones at the cost of duplicating the (small) build
side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str] | str,
                how: str = "inner", salt: int = 8,
                seed: int | None = 42) -> DataFrame:
    """Equi-join with explicit key salting against skew.

    ``big`` gets a uniform random salt in [0, salt); ``small`` is
    exploded across every salt value, so each (key, salt) pair meets
    exactly the right build rows. Result equals ``big.join(small, on,
    how)`` for 'inner'/'left' joins (the supported modes — salting the
    probe side cannot express right/full semantics).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    rand = F.rand(seed) if seed is not None else F.rand()
    b = big.withColumn("__salt__", (rand * salt).cast("int"))
    s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return b.join(s, keys + ["__salt__"], how).drop("__salt__")
