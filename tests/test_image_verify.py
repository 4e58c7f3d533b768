"""Codec roundtrip + Arrow-batched validation/verification kernels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.imagecodec import (
    decode,
    decode_bmp,
    decode_raw,
    encode_bmp,
    encode_raw,
    pixel_hash,
    psnr,
    stub_perceptual_phash,
)
from advanced_data_profile_spark.operators.image_verify import (
    validate_payloads,
    validation_verdicts,
    verify_against_reference,
)
from advanced_data_profile_spark.sources.images import ground_truth, read_images

N_PARTS, ROWS = 4, 250


def _pixels(seed=0, w=20, h=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_raw_roundtrip():
    px = _pixels()
    assert np.array_equal(decode_raw(encode_raw(px), 20, 12), px)


def test_bmp_roundtrip_odd_width():
    # width 21 -> BMP rows need padding; roundtrip must still be exact
    px = _pixels(w=21, h=7)
    assert np.array_equal(decode_bmp(encode_bmp(px), 21, 7), px)


def test_decode_failures():
    px = _pixels()
    with pytest.raises(ValueError):
        decode_raw(encode_raw(px)[:-1], 20, 12)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(px)[:-5], 20, 12)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(px), 19, 12)  # dims mismatch vs header
    with pytest.raises(ValueError):
        decode(encode_raw(px), 20, 12, "tiff??")
    with pytest.raises(ValueError):
        decode(None, 20, 12, "raw")


def test_psnr():
    px = _pixels()
    assert psnr(px, px) == 99.0
    noisy = px.copy()
    noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 128) % 256
    assert 0 < psnr(px, noisy) < 99.0
    assert psnr(px, _pixels(seed=9)) < 40.0


def test_pixel_hash_deterministic_nonnegative():
    px = _pixels()
    assert pixel_hash(px) == pixel_hash(px.copy())
    assert pixel_hash(px) >= 0
    assert pixel_hash(px) != pixel_hash(_pixels(seed=1))


def test_stub_perceptual_phash_locality():
    px = _pixels(w=64, h=64)
    near = px.copy()
    near[0, 0, 0] ^= 1  # tiny perturbation
    a, b = stub_perceptual_phash(px), stub_perceptual_phash(near)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 4
    far = stub_perceptual_phash(_pixels(seed=7, w=64, h=64))
    assert bin((a ^ far) & ((1 << 64) - 1)).count("1") > 4


@pytest.fixture(scope="module")
def images(spark, images_path):
    return read_images(spark, images_path)


def test_validation_matches_ground_truth(images):
    verdicts = validation_verdicts(validate_payloads(images)).collect()
    gt = ground_truth(N_PARTS, ROWS)
    by = {(int(r.part_id), r.constraint): r for r in verdicts}
    for p in range(N_PARTS):
        g = gt[p]
        expected_decode_fails = (
            g["corrupt_payloads"] + g["fmt_violations"]
            + g["w_domain_violations"] + g["dim_mismatch"]
        )
        assert by[(p, "payload_decodes")].n_violations == expected_decode_fails
        assert by[(p, "fmt_known")].n_violations == g["fmt_violations"]


def test_verify_against_reference_self(images):
    # dedup planted duplicate ids first: self-verify must then pass 100%
    clean = images.dropDuplicates(["image_id"])
    out = verify_against_reference(clean, clean)
    agg = out.agg(
        F.sum((~F.col("caption_ok")).cast("int")).alias("cap_bad"),
        F.sum((F.col("error").isNull() & ~F.col("pixels_ok")).cast("int")).alias("px_bad"),
        F.min(F.when(F.col("error").isNull(), F.col("psnr"))).alias("min_psnr"),
    ).collect()[0]
    assert agg.cap_bad == 0
    assert agg.px_bad == 0
    assert agg.min_psnr == 99.0


def test_verify_detects_caption_tamper(spark, images):
    clean = images.dropDuplicates(["image_id"]).where(F.col("caption").isNotNull())
    tampered = clean.withColumn(
        "caption",
        F.when(F.col("image_id") == "img-0000-00000002",
               F.lit("tampered caption")).otherwise(F.col("caption")),
    )
    out = verify_against_reference(tampered, clean)
    bad = out.where(~F.col("caption_ok")).collect()
    assert [r.image_id for r in bad] == ["img-0000-00000002"]


def test_pyarrow_decode_leg_matches_jvm_leg(spark, images_path, images):
    """The pyarrow decode leg (row-group tasks, bytes read inside the
    Python workers) must produce row-identical validation output to
    the JVM-scan leg — same kernel, different transport — including on
    the fixture's planted corrupt/mismatched payloads."""
    from advanced_data_profile_spark.operators.image_verify import (
        decode_file_tasks,
        validate_payloads_files,
    )

    part_ids = sorted(
        r.part_id for r in images.select("part_id").distinct().collect()
    )
    tasks = decode_file_tasks(spark, images_path, part_ids)
    assert len(tasks) >= N_PARTS  # at least one row group per part dir
    assert {t[1] for t in tasks} == set(part_ids)
    via_files = validate_payloads_files(
        spark, images_path, part_ids, tasks=tasks
    )
    via_jvm = validate_payloads(images)

    def norm(df):
        return sorted(
            (
                r.image_id, r.part_id, r.decode_ok, r.dims_match,
                r.fmt_known, r.error,
            )
            for r in df.collect()
        )

    assert norm(via_files) == norm(via_jvm)
    # and the rolled-up verdicts agree with ground truth through the
    # new leg too
    verdicts = validation_verdicts(via_files).collect()
    gt = ground_truth(N_PARTS, ROWS)
    by = {(int(r.part_id), r.constraint): r for r in verdicts}
    for p in range(N_PARTS):
        g = gt[p]
        assert by[(p, "fmt_known")].n_violations == g["fmt_violations"]


def test_pyarrow_decode_leg_prunes_partitions(spark, images_path):
    """Listing only the pending part dirs IS the partition pruning:
    tasks and output rows cover exactly the requested partitions."""
    from advanced_data_profile_spark.operators.image_verify import (
        decode_file_tasks,
        validate_payloads_files,
    )

    tasks = decode_file_tasks(spark, images_path, [1, 3])
    assert {t[1] for t in tasks} == {1, 3}
    out = validate_payloads_files(spark, images_path, [1, 3], tasks=tasks)
    assert {
        r.part_id for r in out.select("part_id").distinct().collect()
    } == {1, 3}


def test_pyarrow_decode_leg_multi_file_part_dirs(spark, tmp_path):
    """Part dirs with MULTIPLE data files (the normal shape at scale —
    the standard fixture writes one file per dir): every file
    contributes its row groups as tasks and the union covers every row
    exactly once, matching the JVM leg."""
    from advanced_data_profile_spark.operators.image_verify import (
        decode_file_tasks,
        validate_payloads_files,
    )
    from advanced_data_profile_spark.sources.images import generate_images

    path = str(tmp_path / "multi")
    (
        generate_images(spark, n_parts=2, rows_per_part=300)
        .repartition(3)  # 3 files per part dir
        .write.partitionBy("part_id")
        .option("compression", "uncompressed")
        .parquet(path)
    )
    tasks = decode_file_tasks(spark, path, [0, 1])
    assert len(tasks) >= 6  # >= 3 files x 2 dirs, each >= 1 row group
    assert len(set(tasks)) == len(tasks)
    out = validate_payloads_files(spark, path, [0, 1], tasks=tasks)
    rows = out.collect()
    assert len(rows) == 600  # every row exactly once (the fixture
    # plants duplicate image_ids on purpose, so multiset parity with
    # the JVM leg below is the no-dup-read/no-missed-read check)
    jvm = validate_payloads(read_images(spark, path)).collect()
    assert sorted(
        (r.image_id, r.decode_ok, r.dims_match) for r in rows
    ) == sorted((r.image_id, r.decode_ok, r.dims_match) for r in jvm)


def test_pyarrow_decode_leg_tolerates_missing_part_dir(spark, images_path):
    """A pending partition whose hive dir is absent contributes no
    decode tasks (same zero rows the JVM scan would see) instead of
    raising inside the decode future — where the failure would surface
    only after the pipeline's results overwrite."""
    from advanced_data_profile_spark.operators.image_verify import (
        decode_file_tasks,
    )

    with_missing = decode_file_tasks(spark, images_path, [1, 9999])
    only_real = decode_file_tasks(spark, images_path, [1])
    assert with_missing == only_real and len(only_real) > 0
