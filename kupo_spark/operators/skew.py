"""Skew-aware join helper.

The engine's skew exposure: a hot key on the policy join index (one policy
held by 10% of all outputs — real on Cardano, where a handful of policies
dominate) or a hot address. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin`, on by default in our sessions) covers the
sort-merge case at runtime; this helper is the explicit salting form for
when the skewed side must hash-join or the optimizer can't see the skew
(e.g. skew introduced by an upstream filter).

``salted_join(facts, dim, key, salt)`` replicates the (small) dim side
`salt` ways and spreads the fact side uniformly across the replicas —
turning one hot partition into `salt` even ones at the cost of a
broadcast-sized dim blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `facts ⋈ dim ON key`, robust to hot fact keys.

    The fact side gets a uniform pseudo-random salt derived from its whole
    row hash (deterministic, no rand() — replayable); the dim side is
    exploded `salt` ways.  Result is identical to the plain join."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.hash(*facts.columns), F.lit(salt))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    out = salted_facts.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")
