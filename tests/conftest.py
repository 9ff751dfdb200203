import os
import tempfile

import pytest

import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    from ray.data import DataContext

    # Per-session superstep workdir root: two pytest/bench processes on one
    # host must never share a live checkpoint dir (pipelines/graphalgos.py
    # _workdir) — concurrent writers corrupt each other's iteration shards.
    os.environ.setdefault(
        "GCGR_WORK_ROOT", tempfile.mkdtemp(prefix="gcgr_work_test_")
    )
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.WARNING)
    yield
    ray.shutdown()
