"""Anyres tiling parity tests.

Golden values hand-derived from the reference algorithms
(mm_pretrain_dataset.py:65-201) — each case was traced by hand against the
reference's arithmetic (banker's rounding, int truncation, ceil on resize).
"""

import numpy as np
from PIL import Image

from leopard_tpu.data.anyres import (
    allocate_patches,
    divide_to_patches,
    preprocess_tiles,
    resize_and_pad,
    select_best_resolution,
    tile_images,
)


def test_allocate_within_budget():
    # 728×364 → round(2)*round(1) = 2; 364×364 → 1 → zeroed
    assert allocate_patches([(728, 364), (364, 364)], 364, 50) == [2, 0]


def test_allocate_single_tile_zeroed():
    assert allocate_patches([(364, 364)], 364, 50) == [0]
    # 500×400: round(500/364)=1, round(400/364)=1 → 1 → 0
    assert allocate_patches([(500, 400)], 364, 50) == [0]


def test_allocate_banker_rounding():
    # 546/364 = 1.5 → banker's round → 2 (even); 910/364 = 2.5 → 2
    assert allocate_patches([(546, 364)], 364, 50) == [2]
    assert allocate_patches([(910, 364)], 364, 50) == [2]


def test_allocate_scale_down():
    # two images wanting 2*2=4 each with budget 5:
    # scale = 5/8 → int(4*0.625)=2 each → total 4 ≤ 5
    assert allocate_patches([(728, 728), (728, 728)], 364, 5) == [2, 2]


def test_allocate_trim_loop():
    # 3 images wanting 4 each, budget 10: scale=10/12 → int(3.33)=3 each = 9 ≤ 10
    assert allocate_patches([(728, 728)] * 3, 364, 10) == [3, 3, 3]
    # budget 7: scale 7/12 → int(2.33)=2 each = 6 ≤ 7
    assert allocate_patches([(728, 728)] * 3, 364, 7) == [2, 2, 2]
    # budget 5: scale 5/12 → int(1.67)=1 each = 3 ≤ 5
    assert allocate_patches([(728, 728)] * 3, 364, 5) == [1, 1, 1]


def test_select_best_resolution_zero_and_degenerate():
    assert select_best_resolution((728, 364), 0) is None
    # 1 tile: only (1,1) grid allowed is skipped → None
    assert select_best_resolution((364, 364), 1) is None


def test_select_best_resolution_wide():
    # wide 2:1 image with 2 tiles → 2 cols × 1 row = (728, 364)
    assert select_best_resolution((1456, 728), 2, 364) == (728, 364)
    # tall image
    assert select_best_resolution((728, 1456), 2, 364) == (364, 728)


def test_select_best_resolution_square():
    assert select_best_resolution((1092, 1092), 4, 364) == (728, 728)


def test_resize_and_pad_centers():
    img = Image.new("RGB", (200, 100), (255, 0, 0))
    out = resize_and_pad(img, (364, 364))
    assert out.size == (364, 364)
    arr = np.asarray(out)
    # vertically centered red band, black above/below
    assert arr[0, 0].tolist() == [0, 0, 0]
    assert arr[182, 182].tolist() == [255, 0, 0]
    assert resize_and_pad(img, None) is None


def test_divide_to_patches_row_major():
    img = Image.new("RGB", (728, 728))
    px = img.load()
    px[400, 10] = (1, 2, 3)  # col 1, row 0 tile
    tiles = divide_to_patches(img, 364)
    assert len(tiles) == 4
    assert np.asarray(tiles[1])[10, 400 - 364].tolist() == [1, 2, 3]


def test_tile_images_order_and_budget():
    imgs = [Image.new("RGB", (1456, 728)), Image.new("RGB", (300, 300))]
    out = tile_images(imgs, tile_size=364, total_budget=50)
    # image0: 4×2 grid = 8 tiles + original; image1 (single-tile-sized): only original
    assert out.tiles_per_image == [8, 0]
    assert out.total_crops == 10
    # order: img0 tiles, img0 original (1456×728), img1 original
    assert all(t.size == (364, 364) for t in out.tiles[:8])
    assert out.tiles[8].size == (1456, 728)
    assert out.tiles[9].size == (300, 300)


def test_tile_images_budget_exhausted():
    imgs = [Image.new("RGB", (728, 728))] * 50
    out = tile_images(imgs, tile_size=364, total_budget=50)
    assert out.tiles_per_image == [0] * 50
    assert out.total_crops == 50


def test_preprocess_tiles_normalization():
    img = Image.new("RGB", (364, 364), (255, 255, 255))
    arr = preprocess_tiles([img], 364)
    assert arr.shape == (1, 3, 364, 364)
    np.testing.assert_allclose(arr, 1.0, atol=1e-6)  # (1.0 - 0.5)/0.5
    img = Image.new("RGB", (10, 10), (0, 0, 0))
    arr = preprocess_tiles([img], 364)
    np.testing.assert_allclose(arr, -1.0, atol=1e-6)
