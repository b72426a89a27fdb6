import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from direct_lidar_odometry_tpu.ops import morton, pallas_nn

rng = np.random.default_rng(0)
def cloud(n, extent):
    m = int(n*0.97)
    p = np.full((n,3),1e6,np.float32)
    p[:m] = rng.uniform(-extent,extent,(m,3)).astype(np.float32)
    p[:m//2,2] = rng.uniform(-2,0,size=m//2)
    msk = np.zeros(n,bool); msk[:m]=True
    return p,msk

def timeit(fn,*a,n=30):
    o=fn(*a); np.asarray(o[0][0,]); t0=time.perf_counter()
    for _ in range(n): o=fn(*a)
    np.asarray(o[0][0,])
    return (time.perf_counter()-t0)/n*1e3

for T,Q,r,ext in [(65536,32768,0.5,60.0),(32768,32768,1.0,60.0)]:
    tp,tm = cloud(T,ext); qp,qm = cloud(Q,ext)
    tps,tms = morton.sort_cloud(jnp.asarray(tp),jnp.asarray(tm))
    qps,qms = morton.sort_cloud(jnp.asarray(qp),jnp.asarray(qm))
    lo,hi = morton.chunk_aabbs(tps,tms,morton.TARGET_CHUNK)
    for mxu in (False,True):
        f = jax.jit(lambda a,b,c,d,e,g,_m=mxu: pallas_nn.query_1nn_sorted(a,b,c,d,e,g,r,interpret=False,mxu=_m))
        ms = timeit(f,tps,tms,lo,hi,qps,qms)
        print(f"T={T} Q={Q} r={r} mxu={mxu}: {ms:.3f} ms")
