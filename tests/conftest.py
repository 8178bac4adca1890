"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
        # ragged list<int32> token columns must stay plain Arrow lists
        ctx.enable_tensor_extension_casting = False
    except Exception:
        pass
    yield
    ray.shutdown()
