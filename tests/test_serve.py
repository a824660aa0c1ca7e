import numpy as np
import pytest

from conftest import random_npenc
from deepmusicgeneration_tpu.codec.index import npenc2idxenc
from deepmusicgeneration_tpu.models.config import small_test_config
from deepmusicgeneration_tpu.tasks.serve import GenerationService
from deepmusicgeneration_tpu.train.learner import MusicLearner


@pytest.fixture(scope="module")
def learner(vocab):
    return MusicLearner(small_test_config(), vocab)


def test_service_batches_concurrent_requests(learner, vocab):
    rng = np.random.default_rng(0)
    seeds = [npenc2idxenc(random_npenc(rng, n_groups=4 + i), vocab)[:-1]
             for i in range(6)]
    service = GenerationService(learner, max_batch=4, max_wait_s=0.05)
    futures = [service.submit(s, n_words=12, seed=1) for s in seeds]
    results = [f.result(timeout=300) for f in futures]
    service.close()
    assert all(len(r) > 0 for r in results)
    for r in results:
        assert (r < len(vocab)).all()


def test_service_mixed_configs(learner, vocab):
    rng = np.random.default_rng(1)
    seed = npenc2idxenc(random_npenc(rng, n_groups=5), vocab)[:-1]
    service = GenerationService(learner, max_batch=4)
    f1 = service.submit(seed, n_words=8, greedy=True)
    f2 = service.submit(seed, n_words=16)
    a, b = f1.result(timeout=300), f2.result(timeout=300)
    service.close()
    assert len(a) > 0 and len(b) > 0


def test_service_rejects_after_close(learner, vocab):
    service = GenerationService(learner)
    service.close()
    with pytest.raises(RuntimeError):
        service.submit(np.array([0, 1]))
