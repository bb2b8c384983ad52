"""Brick decomposition invariants + brick-tracer parity vs the XLA path."""

import numpy as np
import pytest

import jax.numpy as jnp

from pathtracer_cuda_interactive_tpu.models.bricks import (BRICK_DATA_ROWS,
                                                           BRICK_PRIMS,
                                                           NUM_SUBS,
                                                           SUB_PRIMS,
                                                           BrickSet)
from pathtracer_cuda_interactive_tpu.models.device_scene import DeviceScene
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.ops import brickkernel, integrator
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data

W, H = 96, 64


@pytest.fixture(scope="module")
def teapot(scenes_dir):
    pack, parsed = load_scene(f"{scenes_dir}/teapot/teapot_constant.xml")
    return pack, parsed


def test_brick_build_invariants(teapot):
    pack, _ = teapot
    bs = BrickSet.from_pack(pack)
    F = pack.num_triangles
    # SAH leaves have variable fill: at least the full-brick minimum, and
    # every brick holds >= 1 real prim
    assert bs.num_bricks >= -(-F // BRICK_PRIMS)
    rows = bs.brick_data[:, :BRICK_DATA_ROWS].reshape(
        bs.num_bricks * BRICK_PRIMS, 32)
    # every real triangle present exactly once (count by kind flag)
    assert int((rows[:, 0] == 1.0).sum()) == F
    # padding records are all-zero (miss under Moller-Trumbore)
    pad = rows[rows[:, 0] == 0.0]
    assert np.all(pad == 0.0)
    # sub-AABB tables: valid flags count the real sub-chunks per brick;
    # real sub boxes contain their prims
    subs = bs.brick_data[:, BRICK_DATA_ROWS, :].reshape(
        bs.num_bricks, NUM_SUBS, 8)
    per_brick = (rows[:, 0] == 1.0).reshape(bs.num_bricks,
                                            BRICK_PRIMS).sum(axis=1)
    assert np.all(per_brick >= 1)
    assert np.array_equal(subs[..., 6].sum(axis=1).astype(int),
                          -(-per_brick // SUB_PRIMS))
    for b in (0, bs.num_bricks - 1):
        block = rows[b * BRICK_PRIMS:(b + 1) * BRICK_PRIMS]
        for s in range(NUM_SUBS):
            chunk = block[s * SUB_PRIMS:(s + 1) * SUB_PRIMS]
            real = chunk[chunk[:, 0] == 1.0]
            if not len(real):
                assert subs[b, s, 6] == 0.0
                continue
            assert subs[b, s, 6] == 1.0
            pts = np.concatenate([real[:, 1:4],
                                  real[:, 1:4] + real[:, 4:7],
                                  real[:, 1:4] + real[:, 7:10]])
            assert np.all(pts >= subs[b, s, 0:3] - 1e-4)
            assert np.all(pts <= subs[b, s, 3:6] + 1e-4)
    # unpack the 128-wide SMEM packing (models/bricks.py field docs)
    boxes = bs.top_boxes.reshape(-1, 8)[:bs.num_top]
    links = bs.top_links.reshape(-1, 2)[:bs.num_top]
    # brick AABBs contain their member triangles
    for b in (0, bs.num_bricks // 2, bs.num_bricks - 1):
        block = bs.brick_data[b, :BRICK_DATA_ROWS].reshape(BRICK_PRIMS, 32)
        real = block[block[:, 0] == 1.0]
        p0 = real[:, 1:4]
        p1 = p0 + real[:, 4:7]
        p2 = p0 + real[:, 7:10]
        leaf = np.flatnonzero(links[:, 1] == b)
        assert len(leaf) == 1
        bmin = boxes[leaf[0], 0:3]
        bmax = boxes[leaf[0], 3:6]
        for p in (p0, p1, p2):
            assert np.all(p >= bmin - 1e-4) and np.all(p <= bmax + 1e-4)
    # top tree: every brick in exactly one leaf; skip links monotone
    leaves = links[:, 1] >= 0
    assert np.array_equal(np.sort(links[leaves, 1]),
                          np.arange(bs.num_bricks))
    assert np.all(links[:, 0] > np.arange(bs.num_top))


def test_brick_tracer_matches_xla_shallow(teapot):
    pack, parsed = teapot
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    spp, depth = 1, 3
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, spp, max_depth=depth))
    got = np.asarray(brickkernel.render_samples_bricks(
        bs, cd, W, H, 0, spp, max_depth=depth, interpret=True))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    # Morton reordering changes tie-breaks on shared edges for isolated
    # pixels; everything else must agree
    assert bad.mean() < 1e-3, f"{bad.mean():%} mismatched"
    assert np.abs(ref - got).mean() < 1e-3


def test_brick_tracer_with_spheres(scenes_dir):
    # aabb_test: 30 spheres + a triangle OBJ — exercises the resident
    # sphere table alongside bricks
    pack, parsed = load_scene(f"{scenes_dir}/aabb_test/aabb_test.xml")
    ds = DeviceScene.from_pack(pack)
    bs = BrickSet.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
    ref = np.asarray(integrator.render_samples(
        ds, cd, W, H, 0, 1, max_depth=3))
    got = np.asarray(brickkernel.render_samples_bricks(
        bs, cd, W, H, 0, 1, max_depth=3, interpret=True))
    bad = ~np.isclose(got, ref, rtol=1e-4, atol=1e-4)
    assert bad.mean() < 1e-3
