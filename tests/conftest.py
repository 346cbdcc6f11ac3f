"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import faulthandler
import signal

import pytest

# Watchdog: one wedged shuffle must fail the test, not hang the harness
# (round-1 suite hung >9.5 min on a dead Ray session). SIGALRM only fires
# in the main thread, which is where pytest runs the test body.
_TEST_TIMEOUT_S = 240


@pytest.fixture(autouse=True)
def _test_watchdog():
    def _on_alarm(signum, frame):
        faulthandler.dump_traceback()
        raise TimeoutError(f"test exceeded {_TEST_TIMEOUT_S}s watchdog")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    yield
    signal.alarm(0)
    signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(tmp_path_factory):
    """Small deterministic synthetic corpus (t1 smoke tier), cached per session."""
    from wned_ray.synth import CorpusSpec, generate_corpus

    out = tmp_path_factory.mktemp("t1corpus")
    spec = CorpusSpec(seed=42, n_entities=40, n_convs=60, turns_per_conv=8)
    paths = generate_corpus(spec, str(out))
    return paths
