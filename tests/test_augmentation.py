"""Augmentation DAG invariants (SURVEY.md §5.5 count math)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_rsna_spark.operators import augmentation as aug


@pytest.fixture(scope="module")
def tiny(spark):
    patients = spark.createDataFrame(
        [("pos1", "1"), ("neg1", "0"), ("neg2", "0")],
        "patient_id string, target string",
    )
    boxes = spark.createDataFrame(
        [("pos1", 100, 120, 40, 60), ("pos1", 300, 310, 50, 50)],
        "patient_id string, x int, y int, width int, height int",
    )
    return patients, boxes


@pytest.mark.slow
def test_fanout_invariants(tiny):
    patients, boxes = tiny
    out = aug.augment(patients, boxes).cache()
    per_patient = {
        r.patient_id: r.n
        for r in out.groupBy("patient_id")
        .agg(F.countDistinct("image_id").alias("n"))
        .collect()
    }
    # reference invariant: 20 variants per negative, 190 per positive
    assert per_patient == {"pos1": 190, "neg1": 20, "neg2": 20}
    # ids globally unique per (image); rows = images x boxes for positives
    total_images = out.select("image_id").distinct().count()
    assert total_images == 190 + 20 + 20
    pos_rows = out.filter(F.col("patient_id") == "pos1").count()
    assert pos_rows == 190 * 2  # two boxes ride through every variant
    out.unpersist()


def test_flip_variants_mirror_x(tiny):
    patients, boxes = tiny
    out = aug.augment(patients, boxes)
    s1 = out.filter(
        (F.col("stage") == 1) & (F.col("patient_id") == "pos1")
    )
    rows = s1.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.variant_i, r.y, r.width), {})[r.flipped] = r.x
    # stage 1 shifts only (same y/width key both variants): x_fl = 1024 - x - w
    checked = 0
    for (_, _, w), variants in by_key.items():
        if 0 in variants and 1 in variants:
            assert variants[1] == 1024 - variants[0] - w
            checked += 1
    assert checked > 0


def test_determinism(tiny):
    patients, boxes = tiny
    a = sorted(map(tuple, aug.augment(patients, boxes).collect()))
    b = sorted(map(tuple, aug.augment(patients, boxes).collect()))
    assert a == b
