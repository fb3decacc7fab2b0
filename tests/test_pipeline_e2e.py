"""End-to-end pipeline: reference invariants over a handcrafted corpus.

The fan-out math is the reference's own printed accounting
(SURVEY.md §5.5): a negative patient yields 2·(5+5) = 20 images, a
positive 2·(5+25+25+5+25+5+5) = 190.
"""

from __future__ import annotations

import glob

from data_pipeline_rsna_spark.pipelines import run_rsna_pipeline
from data_pipeline_rsna_spark.sinks import tfrecord as tfr
import pytest


@pytest.mark.slow
def test_pipeline_end_to_end(spark, tmp_path):
    rows = []
    # 4 positive patients with 2 boxes each, 6 negatives
    for p in range(4):
        rows += [
            (f"pos{p}", "100.0", "100.0", "50.0", "60.0", "1"),
            (f"pos{p}", "300.0", "300.0", "40.0", "40.0", "1"),
        ]
    for n in range(6):
        rows.append((f"neg{n}", "", "", "", "", "0"))
    raw = spark.createDataFrame(
        rows, "patientId string, x string, y string, width string, "
        "height string, Target string"
    )
    out = str(tmp_path / "tfrecords")
    res = run_rsna_pipeline(
        spark, raw, out, train_shards=4, val_shards=2
    )
    # 10 patients, 80/20 deterministic split (8 train / 2 val by id order)
    # fan-out: positives 190 images, negatives 20 images
    total = res.train_records + res.val_records
    assert total == 4 * 190 + 6 * 20
    assert res.skipped_boxes == 0  # all handcrafted boxes are valid
    assert res.train_records > res.val_records

    # the sink really wrote framed TFRecords with valid CRCs
    files = sorted(glob.glob(f"{out}/train/*.tfrecord"))
    assert len(files) == 4
    n_payloads = sum(len(tfr.read_tfrecords(f)) for f in files)
    assert n_payloads == res.train_records
