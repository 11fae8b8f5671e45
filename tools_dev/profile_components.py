"""Component-level timing of the full-scale fragment forward on TPU."""
import sys, time, faulthandler
faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from eprecon_tpu.config import default_config
from eprecon_tpu.utils.benchmark import time_fn
from eprecon_tpu.ops import sparse as sp

cfg = default_config().model
rng = np.random.default_rng(0)
P = lambda *a: print(*a, flush=True)
t00 = time.time()

# --- backbone: init small, apply big ---
from eprecon_tpu.models.backbone import MnasMulti
m = MnasMulti(1.0)
x_small = jnp.zeros((1,64,64,3))
vs = jax.jit(m.init)(jax.random.PRNGKey(0), x_small)
P(f"[{time.time()-t00:.0f}s] backbone init done")
x = jnp.asarray(rng.standard_normal((9,480,640,3)).astype(np.float32))
f = jax.jit(lambda v, x: m.apply(v, x, mutable=["batch_stats"])[0][0])
P(f"backbone x1: {time_fn(f, vs, x, iters=20):.1f} ms  [{time.time()-t00:.0f}s]")

# --- occupancy init (dense 48^3): init small grid, apply big ---
from eprecon_tpu.models.occupancy_init import OccupancyInitialization
feats = [jnp.asarray(rng.standard_normal((9,1,120,160,24)).astype(np.float32)),
         jnp.asarray(rng.standard_normal((9,1,60,80,40)).astype(np.float32)),
         jnp.asarray(rng.standard_normal((9,1,30,40,80)).astype(np.float32))]
feats_small = [jnp.zeros((2,1,16,16,24)), jnp.zeros((2,1,8,8,40)), jnp.zeros((2,1,4,4,80))]
proj = jnp.asarray(np.broadcast_to(np.eye(4,dtype=np.float32)*np.float32(1), (9,1,4,4)).copy())
projs = jnp.asarray(np.broadcast_to(np.eye(4,dtype=np.float32), (2,1,4,4)).copy())
origin = jnp.zeros((1,3))
oi = OccupancyInitialization()
ovs = jax.jit(lambda k: oi.init(k, feats_small, origin, 0.04, projs, (8,8,8), 2))(jax.random.PRNGKey(0))
P(f"[{time.time()-t00:.0f}s] occ init params done")
g = jax.jit(lambda v, feats: oi.apply(v, feats, origin, 0.04, proj, (48,48,48), 2, mutable=["batch_stats"])[0][0])
P(f"occupancy_init: {time_fn(g, ovs, feats, iters=10):.1f} ms  [{time.time()-t00:.0f}s]")

# --- back_project at stage 2 (524k voxels) ---
from eprecon_tpu.ops.back_project import back_project_mean
K2 = 524288
coords = jnp.asarray(np.concatenate([np.zeros((K2,1),np.int32), rng.integers(0,96,(K2,3)).astype(np.int32)],1))
valid = jnp.asarray(np.arange(K2) < 480000)
imfeats = jnp.asarray(rng.standard_normal((9,1,120,160,24)).astype(np.float32))
bp = jax.jit(lambda c,v,f: back_project_mean(c, v, origin, 0.04, f, proj))
P(f"back_project stage2: {time_fn(bp, coords, valid, imfeats, iters=10):.1f} ms  [{time.time()-t00:.0f}s]")

# --- SPVCNN stage 2 at 524k ---
from eprecon_tpu.models import spvcnn
pts = sp.PointSet(jnp.asarray(np.concatenate([rng.uniform(0,96,(480000,3)).astype(np.float32), np.zeros((K2-480000,3),np.float32)])),
                  jnp.zeros(K2, jnp.int32),
                  jnp.asarray(rng.standard_normal((K2,74)).astype(np.float32)), valid)
unet = spvcnn.SPVCNN(cr=0.25)
# init with a tiny point set (params independent of K)
pts_small = sp.PointSet(jnp.zeros((64,3)), jnp.zeros(64,jnp.int32), jnp.zeros((64,74)), jnp.ones(64,bool))
plan_small = spvcnn.build_plan(pts_small, vres=1.0, window=8)
uvs = jax.jit(unet.init)(jax.random.PRNGKey(1), pts_small.feats, plan_small)
P(f"[{time.time()-t00:.0f}s] unet params done")
def run_unet(uvs, xyz, feats, valid):
    p = sp.PointSet(xyz, jnp.zeros(K2, jnp.int32), feats, valid)
    plan = spvcnn.build_plan(p, vres=1.0, window=192)
    return unet.apply(uvs, feats, plan, mutable=["batch_stats"])[0]
ju = jax.jit(run_unet)
P(f"SPVCNN stage2 (524k): {time_fn(ju, uvs, pts.xyz, pts.feats, valid, iters=5):.1f} ms  [{time.time()-t00:.0f}s]")

# --- GRUFusionStep stage 2 ---
from eprecon_tpu.models.gru_fusion import GRUFusionStep, GlobalMapLevel, FusionInputs
step = GRUFusionStep(ch_voxel=24, ch_img=24, interval=1, voxel_size=0.04, dim=(96,96,96), capacity=K2, point_window=192)
step_small = GRUFusionStep(ch_voxel=24, ch_img=24, interval=1, voxel_size=0.04, dim=(8,8,8), capacity=64, point_window=16)
gmap = GlobalMapLevel.empty(2**21, 48); tmap = GlobalMapLevel.empty(2**21, 1)
gmap_s = GlobalMapLevel.empty(128, 48); tmap_s = GlobalMapLevel.empty(128, 1)
fin = FusionInputs(jnp.zeros(3,jnp.int32), jnp.zeros(3), jnp.eye(4))
featsg = jnp.asarray(rng.standard_normal((K2,48)).astype(np.float32))
tsdfw = jnp.asarray(rng.uniform(-1,1,(96,96,96)).astype(np.float32))
occw = jnp.asarray(rng.random((96,96,96)) < 0.1)
gvs = jax.jit(step_small.init)(jax.random.PRNGKey(2), jnp.zeros((64,4),jnp.int32), jnp.zeros((64,48)), jnp.ones(64,bool), gmap_s, tmap_s, jnp.zeros((8,8,8)), jnp.zeros((8,8,8),bool), fin)
P(f"[{time.time()-t00:.0f}s] gru params done")
jg = jax.jit(lambda v,c,f,vd,gm,tm,tw,ow: step.apply(v,c,f,vd,gm,tm,tw,ow,fin))
P(f"GRUFusionStep stage2: {time_fn(jg, gvs, coords, featsg, valid, gmap, tmap, tsdfw, occw, iters=5):.1f} ms  [{time.time()-t00:.0f}s]")
