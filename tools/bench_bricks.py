"""Large-scene brick-tracer benchmark (bunny by default; pass another
scene XML as argv[1]).  Not part of bench.py: the driver-headline metric
is the cbox interactive config."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys, numpy as np, jax, jax.numpy as jnp
from pathtracer_cuda_interactive_tpu.models.scenepack import load_scene
from pathtracer_cuda_interactive_tpu.models.bricks import BrickSet
from pathtracer_cuda_interactive_tpu.ops.camera import Camera, camera_ray_data
from pathtracer_cuda_interactive_tpu.ops import brickkernel

scene = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/scenes/bunny/bunny.xml"
W, H, SPP = 640, 480, 2
t0=time.time()
pack, parsed = load_scene(scene)
bs = jax.device_put(BrickSet.from_pack(pack))
print("load+bricks", round(time.time()-t0,2), "s;", pack.num_triangles, "tris ->", bs.num_bricks, "bricks,", bs.num_top, "top nodes")
cd = jnp.asarray(camera_ray_data(Camera.from_parsed(parsed.camera), W, H))
t0=time.time()
img = brickkernel.render_samples_bricks(bs, cd, W, H, 0, SPP)
float(np.asarray(img).sum())
print("compile+run", round(time.time()-t0,2))
reps = 10
t0=time.time()
for r in range(1, reps+1):
    img = brickkernel.render_samples_bricks(bs, cd, W, H, r, SPP)
s = float(np.asarray(img).sum())
dt = time.time()-t0
print(f"{reps} frames {dt:.2f}s -> {reps*SPP*W*H/dt/1e6:.2f} Msamples/s ({reps/dt:.1f} fps at {SPP}spp), mean {s/(W*H*SPP):.4f}")
from pathtracer_cuda_interactive_tpu.utils import image as IU
IU.write_png("/tmp/brick_out.png", IU.tonemap(np.asarray(img), SPP))
