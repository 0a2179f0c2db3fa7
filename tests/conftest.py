import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    # num_gpus=2: FAKE GPU resources (local mode needs no hardware) so the
    # GPU-pool placement path (config.convert_num_gpus) is testable
    ray.init(
        address="local",
        num_cpus=4,
        num_gpus=2,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
