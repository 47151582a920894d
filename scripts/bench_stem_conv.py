import time, json
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from mode_tpu.models.blocks import Conv7x7S2Packed

B, H, W = 6, 1024, 512
x = jax.device_put(jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16))
packed = Conv7x7S2Packed(32)
v = packed.init(jax.random.PRNGKey(1), x)
direct = nn.Conv(32, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                 use_bias=False, precision=jax.lax.Precision.DEFAULT)

for name, mod in (("direct", direct), ("packed", packed)):
  @jax.jit
  def run(v, x, mod=mod):
    t = 0.0
    for i in range(20):
      t = t + jnp.sum(mod.apply(v, x + i * 1e-3).astype(jnp.float32))
    return t
  r = run(v, x); np.asarray(r)
  t0 = time.time(); r = run(v, x); s = float(np.asarray(r))
  ms = (time.time() - t0) / 20 * 1e3
  print(json.dumps({"impl": name, "ms": round(ms, 3), "sum": s}), flush=True)
