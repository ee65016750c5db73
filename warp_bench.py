import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from chambers_tpu.ops import image_ops

rng = np.random.RandomState(0)
imgs = jax.device_put(rng.randint(0,256,(32,224,224,3),np.uint8))
K = 10

def timeit(name, f):
    def scan_fn(im, key):
        keys = jax.random.split(key, K)
        def body(c, k):
            return c + jnp.sum(f(im, k).astype(jnp.float32)), None
        t, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return t
    jf = jax.jit(scan_fn)
    t0=time.perf_counter(); float(jf(imgs, jax.random.PRNGKey(0))); c=time.perf_counter()-t0
    ts=[]
    for i in range(2):
        t0=time.perf_counter(); float(jf(imgs, jax.random.PRNGKey(i))); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)/K*1000:.2f} ms/step (compile {c:.0f}s)", flush=True)

def rand_mats(key, b, h, w):
    ang = jax.random.uniform(key, (b,), minval=-0.5, maxval=0.5)
    return image_ops.rotation_matrices(ang, h, w)

def coords(mats, b, h, w):
    ox = jnp.arange(w, dtype=jnp.float32)[None,None,:]
    oy = jnp.arange(h, dtype=jnp.float32)[None,:,None]
    t = mats
    a0,a1,a2 = t[:,0,None,None], t[:,1,None,None], t[:,2,None,None]
    b0,b1,b2 = t[:,3,None,None], t[:,4,None,None], t[:,5,None,None]
    sx = a0*ox + a1*oy + a2
    sy = b0*ox + b1*oy + b2
    ix = jnp.floor(sx+0.5).astype(jnp.int32); iy = jnp.floor(sy+0.5).astype(jnp.int32)
    valid = (ix>=0)&(ix<w)&(iy>=0)&(iy<h)
    return jnp.clip(ix,0,w-1), jnp.clip(iy,0,h-1), valid

def warp_current(im, key):
    mats = rand_mats(key, im.shape[0], im.shape[1], im.shape[2])
    return image_ops.transform(im, mats, fill_value=128)

def warp_tworow(im, key):
    b, h, w, c = im.shape
    mats = rand_mats(key, b, h, w)
    ix, iy, valid = coords(mats, b, h, w)
    rowsel = jnp.take_along_axis(im, iy[..., None], axis=1)
    g = jnp.take_along_axis(rowsel, ix[..., None], axis=2)
    return jnp.where(valid[...,None], g, jnp.uint8(128))

timeit("warp_current", warp_current)
timeit("warp_tworow", warp_tworow)
k = jax.random.PRNGKey(3)
a = np.asarray(jax.jit(warp_current)(imgs, k))
dd = np.asarray(jax.jit(warp_tworow)(imgs, k))
print("tworow equal:", (a==dd).all(), flush=True)
print("DONE", flush=True)
