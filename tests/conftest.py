from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = 4000
SEED = 42


@pytest.fixture(scope="session")
def spark():
    from sparkcollector.session import get_spark

    s = get_spark(
        master="local[4]", app_name="sparkcollector-tests", shuffle_partitions=8
    )
    yield s


@pytest.fixture(scope="session")
def turns_pdf():
    from sparkcollector.synth import generate_pandas

    return generate_pandas(N_TURNS, seed=SEED)


@pytest.fixture(scope="session")
def turns_path(tmp_path_factory):
    from sparkcollector.synth import write_parquet

    p = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    write_parquet(str(p), N_TURNS, seed=SEED)
    return str(p)


@pytest.fixture(scope="session")
def turns_df(spark, turns_path):
    return spark.read.parquet(turns_path)
