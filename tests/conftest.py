import os
import sys

# Force the CPU backend with a virtual 8-device mesh for all tests: sharding
# logic is validated on host devices exactly as the driver's multichip dryrun
# does. Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"  # the env ships JAX_PLATFORMS=axon — override
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

FIXTURES = [
    "/root/reference/fur_elise.mid",
    "/root/reference/Undertale_-_Megalovania.mid",
    "/root/reference/Never_Gonna_Let_You_Go.mid",
]


@pytest.fixture(scope="session")
def vocab():
    from deepmusicgeneration_tpu.vocab import MusicVocab
    return MusicVocab.create()


@pytest.fixture(scope="session")
def s2s_vocab():
    from deepmusicgeneration_tpu.vocab import MusicVocab
    return MusicVocab.create_s2s()


def random_npenc(rng: np.random.Generator, n_groups: int = 40, max_notes: int = 4,
                 n_ins: int = 3) -> np.ndarray:
    """A random grammatical npenc: groups of notes separated by sep rows."""
    from deepmusicgeneration_tpu.vocab import SEP_INS_VAL, VALTSEP
    rows = []
    for g in range(n_groups):
        if g > 0 or rng.random() < 0.5:
            rows.append([VALTSEP, int(rng.integers(1, 9)), SEP_INS_VAL])
        k = int(rng.integers(1, max_notes + 1))
        pitches = np.sort(rng.choice(np.arange(21, 108), size=k, replace=False))[::-1]
        for p in pitches:
            rows.append([int(p), int(rng.integers(1, 32)), int(rng.integers(0, n_ins))])
    return np.array(rows, dtype=np.int64)
