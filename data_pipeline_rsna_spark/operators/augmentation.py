"""The 7-stage augmentation DAG (O19 + O20 + O21), Spark-first.

Reference shape (``generate_images_from_dicom.py:282-561``): seven
sequential loops, each re-listing and re-decoding every DICOM, each
producing k variants + k flipped variants per eligible image with
synthetic ids ``{pid}-{op}-{i}-{stage}``. Eligibility: stages 1 and 4
take every image; stages 2, 3, 5, 6, 7 take positive (box-bearing)
patients only (``:331,372,449,492,533``).

Engine shape: ONE lazy DAG. The source is scanned once (and should be
cached by the caller when the pixel path runs); each stage is an
``explode(sequence())`` fan-out (narrow — no shuffle) plus column
arithmetic for the box geometry; stages are ``unionByName``-ed. The 7×
rescan anti-pattern of the reference (SURVEY.md §4) disappears by
construction.

Stage table (k, positives-only, op-chain):

  1: k=5,  all,  shift_image
  2: k=25, pos,  shift_bbox
  3: k=25, pos,  scale_bbox
  4: k=5,  all,  scale_image
  5: k=25, pos,  scale_bbox -> shift_bbox
  6: k=5,  pos,  shift_image -> shift_bbox
  7: k=5,  pos,  scale_image -> scale_bbox -> shift_bbox

(Stage-4 vs stage-7 zoom factors differ ×10 in the reference — quirk
§2.2-4; the engine uses one factor parameter per stage.) Collision
dropping inside shift_bbox (O16) is modeled separately
(``geometry.collision_pairs``); the DAG translates boxes without the
drop — the §2.2-5 clipping quirk is likewise not replicated.

Fan-out invariants (asserted by the ``augmentation_dag_counts`` query
and the reference's own printouts, SURVEY.md §5.5): a negative patient
yields 2·(5+5) = 20 variants, a positive 2·(5+25+25+5+25+5+5) = 190.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import geometry as geo


@dataclass(frozen=True)
class Stage:
    stage: int
    op: str
    k: int
    positives_only: bool


STAGES: tuple[Stage, ...] = (
    Stage(1, "shift_image", 5, False),
    Stage(2, "shift_bbox", 25, True),
    Stage(3, "scale_bbox", 25, True),
    Stage(4, "scale_image", 5, False),
    Stage(5, "scale_shift_bbox", 25, True),
    Stage(6, "shift_image_shift_bbox", 5, True),
    Stage(7, "scale_image_scale_shift_bbox", 5, True),
)


def _rand_int(*cols: Column, lo: int, hi: int, salt: str) -> Column:
    """Deterministic pseudo-random int in [lo, hi], keyed on the given
    columns — the engine's seeded-RNG convention for column expressions
    (pixel kernels use image_kernels.seeded_rng with the same keying)."""
    h = F.abs(F.xxhash64(F.lit(salt), *cols))
    return (h % (hi - lo + 1) + lo).cast("int")


def _op_chain_exprs(stage: Stage, image_w: int,
                    image_h: int) -> tuple[Column, Column, Column, Column]:
    """The stage's box-geometry chain as four COMPOSED column
    expressions (x, y, width, height). Pixel halves are applied by
    multimodal.apply_kernel when the pipeline carries pixels.

    Returning expressions instead of chaining ``withColumns`` per op
    lets the caller emit ONE projection per branch — the chained form
    cost 4-6 analyzer passes per branch × 7 branches, which dominated
    the DAG's driver-side plan-build time (measured seconds at 30
    columns; the composed expression trees are semantically
    identical, value-pinned by the oracle gate)."""
    key = [F.col("patient_id"), F.col("variant_i"), F.lit(stage.stage)]
    # interpret the op name the way the reference's function chain does
    if stage.op == "shift_image":
        ops = ["shift"]
    elif stage.op == "shift_bbox":
        ops = ["shift"]
    elif stage.op == "scale_bbox":
        ops = ["zoom"]
    elif stage.op == "scale_image":
        ops = ["affine"]
    elif stage.op == "scale_shift_bbox":
        ops = ["zoom", "shift"]
    elif stage.op == "shift_image_shift_bbox":
        ops = ["shift", "shift"]
    elif stage.op == "scale_image_scale_shift_bbox":
        ops = ["affine", "zoom", "shift"]
    else:  # pragma: no cover
        raise ValueError(f"unknown op {stage.op!r}")
    x, y, w, h = (F.col(c) for c in ("x", "y", "width", "height"))
    for step, op in enumerate(ops):
        salt = f"{stage.op}:{step}"
        if op == "shift":
            rx = _rand_int(*key, lo=-50, hi=50, salt=salt + ":x")
            ry = _rand_int(*key, lo=-50, hi=50, salt=salt + ":y")
            x, y = geo.shift_box(x, y, rx, ry)
        elif op == "zoom":
            rf = 1.0 + _rand_int(*key, lo=-8, hi=8, salt=salt) * 0.03125
            x, y, w, h = geo.scale_bbox_recenter(x, y, w, h, rf)
        elif op == "affine":
            rf = 1.0 + _rand_int(*key, lo=-2, hi=2, salt=salt) * 0.03125
            x, y, w, h = geo.scale_image_box_affine(
                x, y, w, h, rf, image_w, image_h
            )
    return x, y, w, h


def augment(patients: DataFrame, boxes: DataFrame, image_w: int = 1024,
            image_h: int = 1024,
            stages: tuple[Stage, ...] = STAGES) -> DataFrame:
    """Run the full DAG over (patient_id, target) + per-box rows.

    Returns one row per generated *box instance* for positives and one
    row per generated image for box-less negatives, with: image_id,
    patient_id, stage, op, variant_i, flipped, and transformed box
    coords (null for negatives).
    """
    # join BEFORE the fan-out: the per-patient boxes join shuffles
    # |patients|+|boxes| rows once, and every stage's ×2k explode is a
    # narrow op on top of it. (Joining after the explode — the naive
    # order — shuffles the fanned rows separately per stage: 7 shuffles
    # of up to 50× the data. With the join hoisted, all 7 branches share
    # one identical join subtree and Spark's ReuseExchange materializes
    # it once.)
    base = patients.join(boxes, "patient_id", "left").withColumn(
        "_has_box", F.col("x").isNotNull()
    )
    branches: list[DataFrame] = []
    for st in stages:
        src = base.filter(F.col("_has_box")) if st.positives_only else base
        with_boxes = (
            src.select(
                "*",
                F.explode(F.sequence(F.lit(0), F.lit(st.k - 1))).alias(
                    "variant_i"
                ),
            )
            .select(
                "*",
                F.explode(F.array(F.lit(0), F.lit(1))).alias("flipped"),
            )
        )
        tx, ty, tw, th = _op_chain_exprs(st, image_w, image_h)
        flipped_x = F.when(
            F.col("flipped") == 1, geo.flip_box_x(tx, tw, image_w)
        ).otherwise(tx)
        branches.append(
            with_boxes.select(
                F.concat_ws(
                    "-",
                    F.col("patient_id"),
                    F.lit(st.op),
                    F.when(F.col("flipped") == 1, F.lit("fl")).otherwise(
                        F.lit("o")
                    ),
                    F.col("variant_i"),
                    F.lit(str(st.stage)),
                ).alias("image_id"),
                "patient_id",
                F.lit(st.stage).alias("stage"),
                F.lit(st.op).alias("op"),
                "variant_i",
                "flipped",
                flipped_x.alias("x"),
                ty.alias("y"),
                tw.alias("width"),
                th.alias("height"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
