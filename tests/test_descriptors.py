"""Appearance descriptors (slam/descriptors.py): patch extraction,
NCC matching, the track drift gate, and occlusion revival inside
incremental_slam. The reference has no feature-identity notion at all
(of.cpp re-seeds corners and drops correspondences) — this is new
capability layered on the LK frontend."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
cv2 = pytest.importorskip("cv2")

from optical_flow_tpu.slam.descriptors import (
    match_descriptors,
    ncc_scores,
    patch_descriptors,
    verify_tracks,
)


def _textured(h=160, w=200, seed=3):
    rng = np.random.RandomState(seed)
    img = cv2.resize(
        rng.rand(h // 8, w // 8).astype(np.float32), (w, h),
        interpolation=cv2.INTER_CUBIC,
    )
    return (255 * (img - img.min()) / np.ptp(img)).astype(np.float32)


class TestPatchDescriptors:
    def test_normalized(self):
        img = _textured()
        pts = np.array([[40.0, 50.0], [100.5, 80.25], [160.0, 120.0]], np.float32)
        d = np.asarray(patch_descriptors(img, pts))
        assert d.shape == (3, 15 * 15)
        np.testing.assert_allclose(np.abs(d).sum(axis=1) > 0, True)
        np.testing.assert_allclose(d.mean(axis=1), 0, atol=1e-5)
        np.testing.assert_allclose((d * d).sum(axis=1), 1, atol=1e-4)

    def test_flat_patch_is_zero(self):
        img = np.full((64, 64), 7.0, np.float32)
        d = np.asarray(patch_descriptors(img, np.array([[32.0, 32.0]])))
        assert np.abs(d).sum() == 0.0

    def test_translation_invariance(self):
        """The same physical patch at its shifted position matches ~1.0;
        integer shifts are exact under bilinear sampling."""
        img = _textured()
        shifted = np.roll(img, (4, 7), axis=(0, 1))
        pts = np.array([[50.0, 60.0], [120.0, 90.0]], np.float32)
        d0 = np.asarray(patch_descriptors(img, pts))
        d1 = np.asarray(patch_descriptors(shifted, pts + [7.0, 4.0]))
        s = ncc_scores(d0, d1)
        assert (s > 0.999).all(), s


class TestMatching:
    def test_recovers_permutation(self):
        img = _textured()
        shifted = np.roll(img, (3, 5), axis=(0, 1))
        pts = np.array(
            [[40.0, 40.0], [100.0, 60.0], [150.0, 110.0], [60.0, 120.0]],
            np.float32,
        )
        da = np.asarray(patch_descriptors(img, pts))
        perm = np.array([2, 0, 3, 1])
        db = np.asarray(patch_descriptors(shifted, pts[perm] + [5.0, 3.0]))
        idx, ok = match_descriptors(da, db)
        assert ok.all()
        # row i of da is the patch at pts[i]; db row j holds pts[perm[j]]
        np.testing.assert_array_equal(perm[idx], np.arange(4))

    def test_rejects_unrelated(self):
        # high-frequency textures: the smooth _textured() ramps can
        # legitimately correlate, fine detail cannot
        rng = np.random.RandomState(1)
        a = (rng.rand(160, 200) * 255).astype(np.float32)
        b = (np.random.RandomState(99).rand(160, 200) * 255).astype(np.float32)
        pts = np.array([[50.0, 50.0], [120.0, 80.0]], np.float32)
        _, ok = match_descriptors(
            np.asarray(patch_descriptors(a, pts)),
            np.asarray(patch_descriptors(b, pts)),
        )
        assert not ok.any()

    def test_empty_sides(self):
        d = np.zeros((0, 225), np.float32)
        e = np.ones((2, 225), np.float32)
        idx, ok = match_descriptors(d, e)
        assert idx.shape == (0,) and ok.shape == (0,)
        idx, ok = match_descriptors(e, d)
        assert not ok.any()


class TestDriftGate:
    def test_true_positions_pass_drifted_fail(self):
        """The scenario the gate exists for: LK reports status=1 but the
        track has slid off its landmark. True positions pass, 5-px
        drifted ones fail."""
        img = _textured()
        pts = np.array(
            [[40.0, 40.0], [100.0, 60.0], [150.0, 110.0]], np.float32
        )
        anchor = np.asarray(patch_descriptors(img, pts))
        assert verify_tracks(anchor, img, pts, gate=0.6).all()
        drifted = pts + np.array([5.0, 4.0], np.float32)
        assert not verify_tracks(anchor, img, drifted, gate=0.6).any()

    def test_flat_anchor_exempt(self):
        img = _textured()
        anchor = np.zeros((1, 225), np.float32)  # flat at birth: no identity
        assert verify_tracks(anchor, img, np.array([[50.0, 50.0]]), gate=0.9).all()


def _render_occlusion_sequence(n=9, h=320, w=416, focal=400.0, seed=5):
    """Sideways-translating camera over a textured plane; frames 3-5
    carry a flat occluder box over the image center that kills the LK
    tracks under it; the texture returns afterwards."""
    rng = np.random.RandomState(seed)
    base = cv2.resize(
        rng.rand(80, 104).astype(np.float32), (w, h),
        interpolation=cv2.INTER_CUBIC,
    )
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    depth = np.clip(
        4.0 + 6.0 * cv2.resize(rng.rand(10, 13).astype(np.float32), (w, h),
                               interpolation=cv2.INTER_CUBIC), 3.0, 12.0
    )
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    inv = focal / depth
    frames = []
    for k in range(n):
        cx_w = 0.03 * k
        f = cv2.remap(base, (xs + cx_w * inv).astype(np.float32), ys,
                      cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)
        if 3 <= k <= 5:
            f = f.copy()
            f[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 128
        frames.append(f)
    return frames, focal


class TestRevivalEndToEnd:
    def test_slam_survives_occlusion(self):
        """incremental_slam with the appearance gate + revival (defaults)
        tracks through a 3-frame occluder that wipes the central tracks
        and keeps a valid reconstruction to the final frame."""
        from optical_flow_tpu.slam import incremental_slam

        frames, focal = _render_occlusion_sequence()
        res = incremental_slam(
            frames, focal, min_tracks=80, window=6,
            bootstrap_min_disparity=4.0,
        )
        assert res is not None
        assert res.keyframes[-1] == len(frames) - 1
        assert res.rmse is not None and res.rmse < 5.0, res.rmse


def test_ratio_gate_rejects_negative_best():
    """A best match with negative NCC is never distinctive: with
    min_score <= 0 the old gate `second <= ratio * best` INVERTED its
    semantics for best < 0 (ADVICE r3); now best <= 0 rows simply fail."""
    u = np.zeros(64, np.float32)
    v = np.zeros(64, np.float32)
    u[0] = 1.0
    v[1] = 1.0
    da = np.stack([u, v])
    # every db column scores <= 0 against every da row
    db = np.stack([-u, -v, -(u + v) / np.sqrt(2, dtype=np.float32)])
    idx, ok = match_descriptors(da, db, min_score=-1.0)
    assert not ok.any()
