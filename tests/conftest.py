from __future__ import annotations

import shutil

import pytest

from advanced_data_profile_spark.session import get_spark
from advanced_data_profile_spark.sources.images import generate_images, write_images

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="adp-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def images_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("images") / "images")
    write_images(generate_images(spark, n_parts=4, rows_per_part=250), path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
