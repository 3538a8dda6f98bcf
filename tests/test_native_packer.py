"""Native (C++) instance packer vs numpy fallback."""

import numpy as np
import pytest

from diffopt_tpu import native


def _ref_pack(triplets, mr, mc):
    out = np.zeros((len(triplets), mr, mc))
    for i, (r, c, v) in enumerate(triplets):
        np.add.at(out[i], (np.asarray(r), np.asarray(c)), np.asarray(v))
    return out


def test_native_builds():
    assert native.native_available(), "C++ packer failed to build"


def test_pack_coo_matches_numpy():
    rng = np.random.default_rng(0)
    triplets = []
    for _ in range(17):
        nnz = rng.integers(0, 40)
        triplets.append(
            (
                rng.integers(0, 12, nnz),
                rng.integers(0, 9, nnz),
                rng.normal(size=nnz),
            )
        )
    out = native.pack_coo_batch(triplets, 12, 9, n_threads=4)
    np.testing.assert_allclose(out, _ref_pack(triplets, 12, 9), atol=1e-14)


def test_pack_coo_accumulates_duplicates():
    t = [(np.array([0, 0]), np.array([1, 1]), np.array([2.0, 3.0]))]
    out = native.pack_coo_batch(t, 2, 2)
    assert out[0, 0, 1] == 5.0


def test_pack_vec_batch():
    rng = np.random.default_rng(1)
    vecs = [rng.normal(size=rng.integers(0, 10)) for _ in range(9)]
    out = native.pack_vec_batch(vecs, 10, fill=7.0)
    for i, v in enumerate(vecs):
        np.testing.assert_allclose(out[i, : len(v)], v)
        assert np.all(out[i, len(v):] == 7.0)
