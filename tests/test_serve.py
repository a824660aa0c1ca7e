"""GenerationService queue/coalescing tests.

These run in a FRESH SUBPROCESS (see test_serve_suite_in_subprocess): after a
few hundred prior tests in the same process, jaxlib 0.9's XLA:CPU compiler
reliably SIGSEGVs while jit-compiling the batched decode scan from the
service's worker thread (backend_compile_and_load; persistent cache off, 256 MB
thread stack, single-device engine — none of it helps, and the same tests pass
every time in a fresh process). Upstream instability, not service logic; the
dp-mesh service path is additionally covered by
test_parallel.py::test_generation_service_uses_dp_mesh.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import random_npenc
from deepmusicgeneration_tpu.codec.index import npenc2idxenc
from deepmusicgeneration_tpu.models.config import small_test_config
from deepmusicgeneration_tpu.tasks.serve import GenerationService
from deepmusicgeneration_tpu.train.learner import MusicLearner

_CHILD = os.environ.get("DMG_SERVE_TEST_CHILD") == "1"

_child_only = pytest.mark.skipif(
    not _CHILD, reason="runs via test_serve_suite_in_subprocess")


@pytest.mark.skipif(_CHILD, reason="wrapper only runs in the parent")
def test_serve_suite_in_subprocess():
    env = {**os.environ, "DMG_SERVE_TEST_CHILD": "1"}
    r = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.abspath(__file__), "-q",
         "-p", "no:cacheprovider"],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"serve tests failed in child:\n{r.stdout}\n{r.stderr}"


@pytest.fixture(scope="module")
def learner(vocab):
    return MusicLearner(small_test_config(), vocab)


_SERVICE = dict(mesh=None)


@_child_only
def test_service_batches_concurrent_requests(learner, vocab):
    rng = np.random.default_rng(0)
    seeds = [npenc2idxenc(random_npenc(rng, n_groups=4 + i), vocab)[:-1]
             for i in range(6)]
    service = GenerationService(learner, max_batch=4, max_wait_s=0.05, **_SERVICE)
    futures = [service.submit(s, n_words=12, seed=1) for s in seeds]
    results = [f.result(timeout=300) for f in futures]
    service.close()
    assert all(len(r) > 0 for r in results)
    for r in results:
        assert (r < len(vocab)).all()


@_child_only
def test_service_mixed_configs(learner, vocab):
    rng = np.random.default_rng(1)
    seed = npenc2idxenc(random_npenc(rng, n_groups=5), vocab)[:-1]
    service = GenerationService(learner, max_batch=4, **_SERVICE)
    f1 = service.submit(seed, n_words=8, greedy=True)
    f2 = service.submit(seed, n_words=16)
    a, b = f1.result(timeout=300), f2.result(timeout=300)
    service.close()
    assert len(a) > 0 and len(b) > 0


@_child_only
def test_service_rejects_after_close(learner, vocab):
    service = GenerationService(learner, **_SERVICE)
    service.close()
    with pytest.raises(RuntimeError):
        service.submit(np.array([0, 1]))
