"""Session-scoped Ray fixture (one init per pytest session) + shared corpora."""

from __future__ import annotations

import logging
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(tmp_path_factory):
    from crawler_service_ray.sources.corpus import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus") / "tiny")
    generate_corpus(d, num_hosts=3, pages_per_host=40, fanout=2, cross=1,
                    num_buckets=8)
    return d


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    from crawler_service_ray.sources.corpus import generate_corpus

    d = str(tmp_path_factory.mktemp("corpus") / "small")
    generate_corpus(d, num_hosts=12, pages_per_host=220, fanout=3, cross=2,
                    num_buckets=16)
    return d
