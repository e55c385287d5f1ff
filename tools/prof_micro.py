import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp
import numpy as np

import functools
@functools.partial(jax.jit)
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:1].sum()

def bench(name, f, *args, reps=8):
    o = f(*args); float(_probe(o))
    # measure fetch round-trip separately
    rt = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(_probe(args[0])); rt = min(rt, time.perf_counter() - t0)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args); float(_probe(o))
        best = min(best, time.perf_counter() - t0)
    best = max(best - rt, 1e-9)
    print(f"{name}: {best*1000:.2f} ms (rt {rt*1000:.2f})")
    return best

x64 = jnp.ones((64*1024*1024,), jnp.float32)   # 256 MB
x8 = jnp.ones((8*1024*1024,), jnp.float32)     # 32 MB
x1 = jnp.ones((1024*1024,), jnp.float32)       # 4 MB
tiny = jnp.ones((1024,), jnp.float32)
f_add = jax.jit(lambda x: x + 1.0)
t = bench("add 256MB (read+write 512MB)", f_add, x64)
print(f"  -> {512/1024/t:.0f} GB/s")
t = bench("add 32MB", f_add, x8)
print(f"  -> {64/1024/t:.0f} GB/s")
bench("add 4MB", f_add, x1)
bench("add 4KB (launch floor)", f_add, tiny)

a = jnp.ones((4096, 4096), jnp.float32)
f_mm = jax.jit(lambda a: a @ a)
t = bench("matmul 4096^3 f32", f_mm, a)
print(f"  -> {2*4096**3/t/1e12:.1f} TFLOP/s")

# chain of 20 small fused ops in one program
def chain(x):
    for i in range(20):
        x = x * 1.0001 + 0.1
        x = jnp.tanh(x)
    return x
f_chain = jax.jit(chain)
bench("chain of 40 elementwise on 4MB", f_chain, x1)

# 15-iter while loop with a 28MB intermediate per iter
big = jnp.ones((12, 8192, 36), jnp.float32)
def loop(x):
    def body(c):
        x, i = c
        y = x * 1.0001
        s = jnp.sum(y, axis=2, keepdims=True)
        return x + 0.000001 * s, i + 1
    x, _ = jax.lax.while_loop(lambda c: c[1] < 15, body, (x, 0))
    return x
bench("while15 over 28MB intermediate", jax.jit(loop), big)
