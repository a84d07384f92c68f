"""Salted-join equivalence: identical results to the plain join under a
manufactured hot key, with the fact side spread across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from kupo_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, index):
    # manufacture skew: every input keyed to one hot policy + a long tail
    facts = index.inputs.select(
        "output_reference",
        F.expr("IF(coins % 10 < 8, 'HOT', concat('p', coins % 97))").alias("policy_id"),
    )
    dim = facts.select("policy_id").distinct().withColumn(
        "weight", F.length("policy_id")
    )
    plain = facts.join(dim, "policy_id", "inner")
    salted = salted_join(facts, dim, "policy_id", salt=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in salted.select("output_reference", "policy_id", "weight").collect()}
    b = {tuple(r) for r in plain.select("output_reference", "policy_id", "weight").collect()}
    assert a == b


def test_salt_actually_spreads_hot_key(spark, index):
    facts = index.inputs.select("output_reference", F.lit("HOT").alias("k"))
    salted = facts.withColumn("_salt", F.pmod(F.hash(*facts.columns), F.lit(8)))
    buckets = salted.groupBy("_salt").count().collect()
    assert len(buckets) == 8  # the single hot key spans all salt buckets
    counts = [r["count"] for r in buckets]
    assert max(counts) < 2 * min(counts)  # roughly uniform
