"""Progressive renderer: accumulation + camera-reset controller.

TPU-native equivalent of the reference's frame loop state machine
(main.cu:272-344, C26/C27 in SURVEY.md): keep a running radiance sum in a
device buffer, add ``samples_per_frame`` fresh samples per step, divide by
the count for display, and zero everything when the camera (or the spf
setting) changes — camera compare with epsilon 1e-5 (main.cu:297-312).

The accumulation buffer is *donated* through the jitted step so XLA updates
it in place (the analog of the persistent ``accumulationBuffer`` in managed
memory, main.cu:213-218).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bricks import BrickSet
from ..models.device_scene import DeviceScene
from ..experiments.mx2set import MX2Set
from ..experiments.mxset import MXSet
from ..models.scenepack import ScenePack, load_scene
from ..ops.brickkernel import render_samples_bricks
from ..experiments.mx2 import render_samples_mx2
from ..experiments.mxtrace import render_samples_mx
from ..ops.wavefront import render_samples_wavefront
from ..ops.camera import Camera, camera_ray_data
from ..ops.integrator import MAX_DEPTH, render_samples
from ..ops.megakernel import MEGAKERNEL_MAX_PRIMS, render_samples_pallas
from ..utils import aotcache
from ..utils import image as img_util
from ..utils.config import RenderConfig, setup_jax


def _render_mode(pack, width: int, height: int,
                 large_scene_mode: str = "wavefront") -> str:
    """Static dispatch between the compute paths.  The SUPPORTED matrix is
    three paths:
      * "megakernel" — small scenes, resident-SMEM Pallas kernel
      * "wavefront"  — large triangle scenes, sorted-wavefront tracer
                       (pair-list or slim-walk engine, ops/wavefront.py)
      * "xla"        — the oracle: CPU test platform (Mosaic only targets
                       TPU) and the rare large sphere-only scene
    The RETIRED experiments (measured slower on TPU — see
    experiments/__init__.py) stay reachable only by explicit opt-in:
      * "mx2" / "mx" via RenderConfig.large_scene_mode, or by handing a
        prebuilt MX2Set / MXSet;
      * "bricks" (persistent-lane packet kernel) via large_scene_mode.

    Accepts a ScenePack, a DeviceScene (has the same count attributes), a
    prebuilt BrickSet, MXSet or MX2Set (pins the large-scene path).
    """
    if isinstance(pack, MX2Set):
        return "mx2"
    if isinstance(pack, MXSet):
        return "mx"
    if isinstance(pack, BrickSet):
        return (large_scene_mode if large_scene_mode not in ("mx", "mx2")
                else "wavefront")
    if jax.default_backend() in ("cpu", "gpu"):
        return "xla"
    if (width * height >= 2 ** 24
            and large_scene_mode not in ("wavefront", "mx")):
        return "xla"   # megakernel/bricks reconstruct pixel indices in f32
    if pack.num_prims <= MEGAKERNEL_MAX_PRIMS:
        if width * height >= 2 ** 24:
            return "xla"
        return "megakernel"
    if pack.num_triangles > 0 and pack.num_spheres <= MEGAKERNEL_MAX_PRIMS:
        return large_scene_mode
    return "xla"


@partial(jax.jit, static_argnames=("width", "height", "num_samples", "seed",
                                   "max_depth", "mode", "nee",
                                   "rr_start_depth", "trace",
                                   "compact_tail", "tail_trace"),
         donate_argnames=("accum",))
def _accumulate_step(scene, cam_data, accum, sample_start,
                     width: int, height: int, num_samples: int, seed: int,
                     max_depth: int, mode: str, nee: bool = False,
                     rr_start_depth: int = 5, trace: str = "slim",
                     compact_tail: int = 8, tail_trace: str = ""):
    if mode == "megakernel":
        new = render_samples_pallas(scene, cam_data, width, height,
                                    sample_start, num_samples, seed,
                                    max_depth, rr_start_depth=rr_start_depth,
                                    nee=nee)
    elif mode == "mx2":
        new = render_samples_mx2(scene, cam_data, width, height,
                                 sample_start, num_samples, seed, max_depth,
                                 rr_start_depth=rr_start_depth, nee=nee)
    elif mode == "mx":
        new = render_samples_mx(scene, cam_data, width, height,
                                sample_start, num_samples, seed, max_depth,
                                rr_start_depth=rr_start_depth, nee=nee)
    elif mode == "wavefront":
        new = render_samples_wavefront(scene, cam_data, width, height,
                                       sample_start, num_samples, seed,
                                       max_depth,
                                       rr_start_depth=rr_start_depth,
                                       nee=nee, trace=trace,
                                       compact_tail=compact_tail,
                                       tail_trace=tail_trace)
    elif mode == "bricks":
        new = render_samples_bricks(scene, cam_data, width, height,
                                    sample_start, num_samples, seed,
                                    max_depth, rr_start_depth=rr_start_depth)
    else:
        new = render_samples(scene, cam_data, width, height, sample_start,
                             num_samples, seed, max_depth, nee,
                             rr_start_depth)
    return accum + new


class ProgressiveRenderer:
    """Host-side controller.  Owns the device scene, current camera, the
    accumulation buffer and the sample count."""

    def __init__(self, scene: ScenePack, camera: Camera, width: int,
                 height: int, config: RenderConfig = RenderConfig()):
        setup_jax()
        self.mode = _render_mode(scene, width, height,
                                 config.large_scene_mode)
        if config.enable_nee and self.mode == "bricks":
            # the persistent brick kernel has no NEE hook; the sorted
            # wavefront (same BrickSet) does
            self.mode = "wavefront"
        if isinstance(scene, ScenePack):
            if self.mode == "mx2":
                scene = MX2Set.from_pack(scene)
            elif self.mode == "mx":
                scene = MXSet.from_pack(scene)
            elif self.mode in ("bricks", "wavefront"):
                scene = BrickSet.from_pack(scene)
            else:
                scene = DeviceScene.from_pack(scene)
        elif self.mode == "mx2" and not isinstance(scene, MX2Set):
            self.mode = "xla"   # caller handed a prebuilt DeviceScene
        elif self.mode == "mx" and not isinstance(scene, MXSet):
            self.mode = "xla"   # caller handed a prebuilt DeviceScene
        elif (self.mode in ("bricks", "wavefront")
              and not isinstance(scene, BrickSet)):
            self.mode = "xla"   # caller handed a prebuilt DeviceScene
        self.scene = jax.device_put(scene)
        self.camera = camera
        self.initial_camera = camera
        self.width = width
        self.height = height
        self.config = config
        self.samples_per_frame = config.samples_per_frame
        self._prev_spf = self.samples_per_frame
        self._cam_data = jnp.asarray(camera_ray_data(camera, width, height))
        self.accum = jnp.zeros((height, width, 3), jnp.float32)
        self.sample_count = 0
        self.frame_ms = 0.0
        # per-samples-per-launch compiled step executables.  Routed through
        # the AOT executable cache (utils/aotcache.py) so a fresh process
        # re-rendering a known (scene shapes, W, H, config) loads the
        # serialized executable in <1 s instead of recompiling for minutes
        # — the analog of the reference's build-time-compiled kernels.
        self._exe_cache: dict = {}

    @classmethod
    def from_xml(cls, xml_path: str,
                 config: RenderConfig = RenderConfig(),
                 width: Optional[int] = None,
                 height: Optional[int] = None) -> "ProgressiveRenderer":
        pack, parsed = load_scene(xml_path)
        cam = Camera.from_parsed(parsed.camera)
        return cls(pack, cam, width or parsed.camera.width,
                   height or parsed.camera.height, config)

    # -- camera interaction (main.cu:297-324 semantics) -----------------
    def set_camera(self, camera: Camera) -> None:
        if not camera.almost_equal(self.camera, self.config.camera_epsilon):
            self.camera = camera
            self._cam_data = jnp.asarray(
                camera_ray_data(camera, self.width, self.height))
            self.reset_accumulation()

    def reset_camera(self) -> None:
        """'R' key / Reset button (imgui_manager.cpp:289-307)."""
        self.set_camera(self.initial_camera)

    def set_samples_per_frame(self, spf: int) -> None:
        spf = int(np.clip(spf, self.config.spf_min, self.config.spf_max))
        if spf != self.samples_per_frame:
            self.samples_per_frame = spf
            self.reset_accumulation()  # main.cu:328-332

    def reset_accumulation(self) -> None:
        self.accum = jnp.zeros((self.height, self.width, 3), jnp.float32)
        self.sample_count = 0

    # -- the frame step (main.cu:333-337) --------------------------------
    def step(self, num_samples: Optional[int] = None,
             sync: Optional[bool] = None) -> None:
        """Add ``num_samples`` fresh samples to the accumulation buffer.

        ``sync=True`` blocks until the device finishes (the reference's
        per-frame cudaDeviceSynchronize, main.cu:336, and what makes
        ``frame_ms`` meaningful).  ``sync=False`` lets successive steps
        pipeline on the device — right for batch/throughput use, where a
        host round-trip per frame would serialize on link latency rather
        than chip time.  Default comes from ``config.sync_each_frame``."""
        ns = num_samples or self.samples_per_frame
        if sync is None:
            sync = self.config.sync_each_frame
        t0 = time.perf_counter()
        exe = self._exe_cache.get(ns)
        if exe is None:
            exe = aotcache.cached_compile(
                _accumulate_step, self.scene, self._cam_data, self.accum,
                jnp.uint32(self.sample_count), self.width, self.height,
                ns, self.config.seed, self.config.max_depth, self.mode,
                self.config.enable_nee, self.config.rr_start_depth,
                self.config.wavefront_trace,
                self.config.wavefront_compact_tail,
                self.config.wavefront_tail_trace,
                # kernel-only statics (e.g. slim vs slimg gating) can
                # leave the OUTER module identical, so they must ride
                # the cache key via the tag
                tag=f"step_{self.mode}_{self.config.wavefront_trace}"
                    f"_{self.config.wavefront_compact_tail}"
                    f"_{self.config.wavefront_tail_trace or 'same'}")
            self._exe_cache[ns] = exe
        # statics (width..trace) are baked into the executable; the call
        # takes only the traced pytree
        self.accum = exe(self.scene, self._cam_data, self.accum,
                         jnp.uint32(self.sample_count))
        if sync:
            # A 4-byte dependent readback, not block_until_ready: on the
            # tunneled TPU platform block_until_ready can return before
            # device completion (tools/probe_hw.py), which would make
            # frame_ms (and the viewer FPS overlay) fiction.
            np.asarray(self.accum[:1, :1, :1])
        self.frame_ms = (time.perf_counter() - t0) * 1e3
        self.sample_count += ns

    # -- output ----------------------------------------------------------
    def framebuffer(self) -> np.ndarray:
        """Tonemapped uint8 [H,W,3] (UpdateTexture semantics)."""
        return img_util.tonemap(np.asarray(self.accum), self.sample_count)

    def hdr(self) -> np.ndarray:
        return np.asarray(self.accum) / max(self.sample_count, 1)

    def save_png(self, path: str) -> None:
        img_util.write_png(path, self.framebuffer())

    # -- checkpoint / resume (capability beyond the reference; SURVEY §5) -
    def save_checkpoint(self, path: str) -> None:
        img_util.save_exr_like_npz(
            path, np.asarray(self.accum), self.sample_count,
            camera=np.array(self.camera.lookfrom + self.camera.lookat
                            + self.camera.up + (self.camera.vfov,)))

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        accum = data["accum"]
        if accum.shape != (self.height, self.width, 3):
            raise ValueError("checkpoint resolution mismatch")
        cam = data["camera"]
        self.set_camera(Camera(tuple(cam[0:3]), tuple(cam[3:6]),
                               tuple(cam[6:9]), float(cam[9])))
        self.accum = jnp.asarray(accum)
        self.sample_count = int(data["sample_count"])
