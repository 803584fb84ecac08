"""Native index builders: compile check + C++/numpy fallback agreement."""

import numpy as np
import pytest

from leopard_tpu.data import native


def test_native_compiles():
    assert native.native_available(), "g++ build of index_builders.cpp failed"


def test_blending_matches_fallback():
    w = np.array([0.5, 0.3, 0.2])
    idx_c, samp_c = native.build_blending_indices(w, 100)
    # force fallback path
    orig = native._lib
    try:
        native._lib, native._build_failed = None, True
        idx_py, samp_py = native.build_blending_indices(w, 100)
    finally:
        native._lib, native._build_failed = orig, False
    np.testing.assert_array_equal(idx_c, idx_py)
    np.testing.assert_array_equal(samp_c, samp_py)
    # realized mix tracks the weights
    counts = np.bincount(idx_c, minlength=3)
    np.testing.assert_allclose(counts / 100, w, atol=0.02)


def test_exhaustive_blending_exact_counts():
    sizes = np.array([7, 3, 5], np.int64)
    idx, samp = native.build_exhaustive_blending_indices(sizes)
    assert len(idx) == 15
    np.testing.assert_array_equal(np.bincount(idx, minlength=3), sizes)
    # per-dataset sample indices are 0..size-1 in order
    for d in range(3):
        np.testing.assert_array_equal(samp[idx == d], np.arange(sizes[d]))


def test_sample_index_packing():
    # 3 docs of 10 tokens, seq_len 4 → each sample consumes 5 tokens
    lengths = np.array([10, 10, 10], np.int32)
    order = np.array([0, 1, 2], np.int32)
    rows = native.build_sample_index(lengths, order, seq_len=4, num_samples=5)
    assert rows.shape == (6, 2)
    # first sample: starts (0,0) ends (0,5)
    np.testing.assert_array_equal(rows[0], [0, 0])
    np.testing.assert_array_equal(rows[1], [0, 5])
    np.testing.assert_array_equal(rows[2], [1, 0])  # 10 tokens consumed
    # matches fallback
    orig = native._lib
    try:
        native._lib, native._build_failed = None, True
        rows_py = native.build_sample_index(lengths, order, 4, 5)
    finally:
        native._lib, native._build_failed = orig, False
    np.testing.assert_array_equal(rows, rows_py)


def test_shuffle_deterministic_permutation():
    a = native.shuffle_indices(1000, seed=7)
    b = native.shuffle_indices(1000, seed=7)
    c = native.shuffle_indices(1000, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))


def test_pack_sequences_ffd():
    lengths = np.array([10, 90, 50, 50, 200], np.int32)
    bins, nbins = native.pack_sequences_ffd(lengths, 100)
    assert bins[4] == -1  # too long
    assert nbins == 2
    # bin loads within capacity
    for b in range(nbins):
        assert lengths[bins == b].sum() <= 100
    # all placeable samples placed
    assert (bins[:4] >= 0).all()
    # fallback agreement
    orig = native._lib
    try:
        native._lib, native._build_failed = None, True
        bins_py, nbins_py = native.pack_sequences_ffd(lengths, 100)
    finally:
        native._lib, native._build_failed = orig, False
    np.testing.assert_array_equal(bins, bins_py)
    assert nbins == nbins_py
