"""Headless smoke-test driver (app_utils_tester.py:1-8 work-alike)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main(mid_file: str = "/root/reference/fur_elise.mid"):
    from deepmusicgeneration_tpu.app.app_utils import (
        createGenreContinuationModel,
        predictNwGenreModel,
    )

    model = createGenreContinuationModel()
    full = predictNwGenreModel(model, mid_file, genre=" jazz ", max_len=128,
                               mem_len=2048)
    print(f"generated {len(full)} tokens")
    os.makedirs("outputs", exist_ok=True)
    full.write_midi("outputs/tester_output.mid")
    print("wrote outputs/tester_output.mid")


if __name__ == "__main__":
    main(*sys.argv[1:2])
