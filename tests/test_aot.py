"""AOT executable-cache key tests (utils/aot.py).

The round-2 advisor's top finding was a cache key that ignored the
CLIVE2_* env knobs: flipping e.g. CLIVE2_REFERENCE_MIS after a default
run silently served the stale executable with the wrong estimator.
These tests pin every ingredient the key must rotate on — env knobs,
the tuned-defaults file, argument shapes/pytree structure, the caller
salt — and that it is stable when nothing relevant changes.
"""

import numpy as np
import pytest

from clive2_tpu.utils import aot


@pytest.fixture()
def args():
    return ({"x": np.zeros((4, 3), np.float32)}, np.int32(1))


def test_key_stable(args, monkeypatch):
    monkeypatch.setenv("CLIVE2_TUNED", "0")
    assert aot.cache_key(args) == aot.cache_key(args)


def test_key_rotates_on_env_knob(args, monkeypatch):
    monkeypatch.setenv("CLIVE2_TUNED", "0")
    base = aot.cache_key(args)
    monkeypatch.setenv("CLIVE2_REFERENCE_MIS", "1")
    assert aot.cache_key(args) != base
    monkeypatch.delenv("CLIVE2_REFERENCE_MIS")
    assert aot.cache_key(args) == base
    # non-CLIVE2 env must NOT rotate the key
    monkeypatch.setenv("SOME_OTHER_VAR", "1")
    assert aot.cache_key(args) == base


def test_key_rotates_on_tuned_file(args, monkeypatch, tmp_path):
    monkeypatch.setenv("CLIVE2_TUNED", "1")
    p = tmp_path / "tuned.json"
    monkeypatch.setenv("CLIVE2_TUNED_PATH", str(p))
    base = aot.cache_key(args)
    p.write_text('{"wide_gate": "1"}')
    flipped = aot.cache_key(args)
    assert flipped != base
    p.write_text('{"wide_gate": "1", "wide_pop2": "1"}')
    assert aot.cache_key(args) not in (base, flipped)


def test_key_rotates_on_shapes_structure_salt(args, monkeypatch):
    monkeypatch.setenv("CLIVE2_TUNED", "0")
    base = aot.cache_key(args)
    bigger = ({"x": np.zeros((8, 3), np.float32)}, np.int32(1))
    assert aot.cache_key(bigger) != base
    # pytree STRUCTURE (e.g. the scene's compact marker key) rotates too
    marked = ({"x": np.zeros((4, 3), np.float32),
               "compact": np.int32(1)}, np.int32(1))
    assert aot.cache_key(marked) != base
    assert aot.cache_key(args, salt="other-fn") != base
