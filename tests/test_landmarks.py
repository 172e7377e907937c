"""Native dlib shape_predictor reader/evaluator tests.

Parity target: utils/alignment.py:9-27 (dlib shape_predictor usage).
Round-trip through our own writer validates the serialization codec;
evaluator tests check the ERT cascade semantics (coordinate mapping,
similarity transform, tree traversal) against hand-computed cases.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tgi.utils.landmarks import (RegressionTree, ShapePredictor, _Reader,
                                 _similarity_2x2, _write_float, _write_int,
                                 detect_face_box, load_shape_predictor,
                                 predict_landmarks, save_shape_predictor)


def test_int_codec():
    vals = [0, 1, -1, 127, 128, 255, 256, -300, 2 ** 31, -2 ** 31,
            2 ** 53 + 7, -(2 ** 60)]
    buf = bytearray()
    for v in vals:
        _write_int(buf, v)
    r = _Reader(bytes(buf))
    assert [r.int_() for _ in vals] == vals
    # encoding detail: zero is a lone 0x00 control byte; 1 is 0x01 0x01
    one = bytearray(); _write_int(one, 1)
    zero = bytearray(); _write_int(zero, 0)
    assert bytes(one) == b"\x01\x01" and bytes(zero) == b"\x00"
    neg = bytearray(); _write_int(neg, -2)
    assert bytes(neg) == b"\x81\x02"


def test_float_codec_exact_for_float32():
    rng = np.random.RandomState(0)
    vals = np.r_[rng.randn(64).astype(np.float32),
                 np.float32([0.0, 1.0, -1.0, 1e-20, -3e15])]
    buf = bytearray()
    for v in vals:
        _write_float(buf, float(v))
    r = _Reader(bytes(buf))
    got = np.asarray([r.float_() for _ in vals])
    np.testing.assert_array_equal(got, vals.astype(np.float64))


def _face_initial_shape():
    """A plausible 68-point layout in normalized [0,1]^2 coords."""
    lm = np.zeros((68, 2))
    lm[0:17] = np.stack([np.linspace(0.1, 0.9, 17),
                         0.45 + 0.35 * np.sin(
                             np.linspace(0, np.pi, 17))], 1)  # jaw
    lm[17:22] = np.stack([np.linspace(0.2, 0.4, 5),
                          np.full(5, 0.30)], 1)  # brows
    lm[22:27] = np.stack([np.linspace(0.6, 0.8, 5), np.full(5, 0.30)], 1)
    lm[27:31] = np.stack([np.full(4, 0.5),
                          np.linspace(0.35, 0.55, 4)], 1)  # nose bridge
    lm[31:36] = np.stack([np.linspace(0.42, 0.58, 5),
                          np.full(5, 0.60)], 1)  # nose base
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    lm[36:42] = np.stack([0.33 + 0.05 * np.cos(ang),
                          0.40 + 0.025 * np.sin(ang)], 1)  # left eye
    lm[42:48] = np.stack([0.67 + 0.05 * np.cos(ang),
                          0.40 + 0.025 * np.sin(ang)], 1)  # right eye
    ang12 = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    lm[48:60] = np.stack([0.5 + 0.12 * np.cos(ang12),
                          0.72 + 0.05 * np.sin(ang12)], 1)  # outer mouth
    ang8 = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    lm[60:68] = np.stack([0.5 + 0.06 * np.cos(ang8),
                          0.72 + 0.02 * np.sin(ang8)], 1)  # inner mouth
    return lm


def _synthetic_predictor(n_cascades=2, n_trees=3, depth=2, seed=0,
                         scale=0.01):
    rng = np.random.RandomState(seed)
    shape0 = _face_initial_shape().reshape(-1)
    L2 = shape0.size
    forests, anchors, deltas = [], [], []
    n_feats = 32
    for _ in range(n_cascades):
        trees = []
        n_splits = 2 ** depth - 1
        for _ in range(n_trees):
            splits = rng.randint(0, n_feats, size=(n_splits, 2))
            thresh = rng.randn(n_splits) * 8
            leaves = rng.randn(n_splits + 1, L2) * scale
            trees.append(RegressionTree(splits.astype(np.int64), thresh,
                                        leaves))
        forests.append(trees)
        anchors.append(rng.randint(0, 68, size=n_feats).astype(np.int64))
        deltas.append(rng.randn(n_feats, 2) * 0.05)
    return ShapePredictor(shape0, forests, anchors, deltas)


def test_predictor_roundtrip(tmp_path):
    sp = _synthetic_predictor()
    path = str(tmp_path / "sp.dat")
    save_shape_predictor(sp, path)
    sp2 = load_shape_predictor(path)
    np.testing.assert_array_equal(sp2.initial_shape, sp.initial_shape)
    assert len(sp2.forests) == len(sp.forests)
    for ta, tb in zip(sp.forests, sp2.forests):
        for a, b in zip(ta, tb):
            np.testing.assert_array_equal(a.splits, b.splits)
            np.testing.assert_array_equal(a.thresh, b.thresh)
            np.testing.assert_array_equal(a.leaf_values, b.leaf_values)
    for a, b in zip(sp.anchor_idx, sp2.anchor_idx):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(sp.deltas, sp2.deltas):
        np.testing.assert_array_equal(a, b)
    # evaluation identical through the round trip
    img = np.random.RandomState(1).randint(
        0, 255, size=(96, 80), dtype=np.uint8)
    np.testing.assert_array_equal(predict_landmarks(sp, img),
                                  predict_landmarks(sp2, img))


def test_npz_cache_roundtrip(tmp_path):
    sp = _synthetic_predictor()
    path = str(tmp_path / "sp.dat")
    save_shape_predictor(sp, path)
    cold = load_shape_predictor(path)  # parses + writes sp.dat.tgi.npz
    assert os.path.exists(path + ".tgi.npz")
    warm = load_shape_predictor(path)  # served from the cache
    img = np.random.RandomState(2).randint(0, 255, (64, 64), np.uint8)
    np.testing.assert_array_equal(predict_landmarks(cold, img),
                                  predict_landmarks(warm, img))


def test_zero_update_maps_initial_shape_to_rect():
    """With all-zero leaves the output is the initial shape unnormalized
    by the rect corners (shape_predictor.h unnormalizing_tform)."""
    sp = _synthetic_predictor(scale=0.0)
    img = np.zeros((100, 200), np.uint8)
    rect = (40, 10, 139, 89)  # left, top, right, bottom (inclusive)
    got = predict_landmarks(sp, img, rect)
    pts = sp.initial_shape.reshape(-1, 2)
    want = np.stack([40 + pts[:, 0] * (139 - 40),
                     10 + pts[:, 1] * (89 - 10)], 1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_single_split_branches_on_pixel_difference():
    """One cascade, one depth-1 tree: left leaf iff I[p1]-I[p2] > t."""
    shape0 = _face_initial_shape().reshape(-1)
    L2 = shape0.size
    left_leaf = np.full(L2, 0.25)
    right_leaf = np.full(L2, -0.25)
    tree = RegressionTree(np.asarray([[0, 1]], np.int64),
                          np.asarray([10.0]),
                          np.stack([left_leaf, right_leaf]))
    # anchor both features at landmark 30 with deltas straight up/down;
    # with rect == full image the similarity transform is identity.
    sp = ShapePredictor(shape0, [[tree]],
                        [np.asarray([30, 30], np.int64)],
                        [np.asarray([[0.0, -0.2], [0.0, 0.2]])])
    img = np.zeros((64, 64), np.uint8)
    base = predict_landmarks(
        ShapePredictor(shape0, [[]], [np.zeros(0, np.int64)],
                       [np.zeros((0, 2))]), img)
    # feature 1 (delta -0.2: above the anchor) bright -> diff 255 > 10
    img_l = img.copy()
    img_l[:img.shape[0] // 2] = 255
    got_l = predict_landmarks(sp, img_l)
    np.testing.assert_allclose(got_l - base, 0.25 * 63, atol=1e-9)
    # both dark -> diff 0 <= 10 -> right leaf
    got_r = predict_landmarks(sp, img)
    np.testing.assert_allclose(got_r - base, -0.25 * 63, atol=1e-9)


def test_similarity_transform_recovers_rotation_scale():
    rng = np.random.RandomState(3)
    pts = rng.randn(20, 2)
    th, c = 0.4, 1.7
    rot = np.asarray([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]])
    m = _similarity_2x2(pts, pts @ (c * rot).T + np.asarray([3.0, -2.0]))
    np.testing.assert_allclose(m, c * rot, atol=1e-10)


def test_align_cli_with_predictor(tmp_path):
    from click.testing import CliRunner

    from tgi.apps.align_data import main
    sp = _synthetic_predictor(scale=0.001)
    pred_path = str(tmp_path / "sp.dat")
    save_shape_predictor(sp, pred_path)
    src = tmp_path / "raw"
    dst = tmp_path / "aligned"
    src.mkdir()
    rng = np.random.RandomState(5)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, size=(160, 140, 3),
                                    dtype=np.uint8)).save(
            src / f"img{i}.png")
    res = CliRunner().invoke(main, ["--src", str(src), "--dst", str(dst),
                                    "--predictor", pred_path,
                                    "--size", "64"])
    assert res.exit_code == 0, res.output
    outs = sorted(os.listdir(dst))
    assert "img0.png" in outs and "img1.png" in outs
    with open(dst / "_landmarks.json") as f:
        table = json.load(f)
    assert np.asarray(table["img0.png"]).shape == (68, 2)
    assert Image.open(dst / "img0.png").size == (64, 64)


def test_detect_face_box_default_centered():
    box = detect_face_box(np.zeros((100, 200, 3), np.uint8))
    left, top, right, bottom = box
    assert abs((left + right) / 2 - 100) < 1
    assert abs((top + bottom) / 2 - 50) < 1
    assert 60 <= right - left <= 75
