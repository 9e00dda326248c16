import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    # own the session only if nobody else initialized Ray (running the
    # suite from a live driver/notebook must not lose its cluster at
    # teardown — the same guarded-ownership contract as __main__)
    owned = not ray.is_initialized()
    if owned:
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    if owned:
        ray.shutdown()
