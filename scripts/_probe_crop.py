"""Probe crop formulations for the checkers egocentric observation.

loc is CARRIED and mutated per step so nothing hoists out of the scan.
"""
import time, jax, jax.numpy as jnp

B, N, K = 8192, 2, 2
R, C, H = 7, 14, 3
steps, reps = 256, 5

key = jax.random.PRNGKey(0)
world0 = jax.random.normal(key, (B, R, C, H))
loc0 = jnp.stack([jax.random.randint(key, (B, N), K, R - K),
                  jax.random.randint(key, (B, N), K, C - K)], axis=-1)

span = jnp.arange(2 * K + 1)


def crop_dynslice(world, loc):
    def one(w, rc):
        return jax.lax.dynamic_slice(w, (rc[0] - K, rc[1] - K, 0),
                                     (2 * K + 1, 2 * K + 1, H))
    return jax.vmap(lambda w, l: jax.vmap(lambda rc: one(w, rc))(l))(world, loc)


def crop_einsum(world, loc):
    def one(w, l):
        sel_r = jax.nn.one_hot(l[:, 0, None] - K + span[None], R)
        sel_c = jax.nn.one_hot(l[:, 1, None] - K + span[None], C)
        return jnp.einsum("niR,RCh,njC->nijh", sel_r, w, sel_c)
    return jax.vmap(one)(world, loc)


def crop_mulsum(world, loc):
    sel_r = jax.nn.one_hot(loc[..., 0, None] - K + span[None, None], R)
    sel_c = jax.nn.one_hot(loc[..., 1, None] - K + span[None, None], C)
    rows = (sel_r[:, :, :, :, None, None] *
            world[:, None, None, :, :, :]).sum(3)
    return (rows[:, :, :, None, :, :] *
            sel_c[:, :, None, :, :, None]).sum(4)


def crop_windows(world, loc):
    # all sliding 5x5 windows via static slices (fused), then per-agent
    # masked sum over the (R-2K)*(C-2K) valid anchor positions
    nr, nc = R - 2 * K, C - 2 * K
    wins = jnp.stack([world[:, i:i + 2 * K + 1, j:j + 2 * K + 1, :]
                      for i in range(nr) for j in range(nc)], axis=1)
    # [B, P, 5, 5, H] with P = nr*nc
    pos = (loc[..., 0] - K) * nc + (loc[..., 1] - K)          # [B, N]
    sel = jax.nn.one_hot(pos, nr * nc)                        # [B, N, P]
    return (sel[..., None, None, None] * wins[:, None]).sum(2)


VARIANTS = {"dynslice": crop_dynslice, "einsum": crop_einsum,
            "mulsum": crop_mulsum, "windows": crop_windows}

ref = crop_dynslice(world0, loc0)
for name, fn in VARIANTS.items():
    if name == "dynslice":
        continue
    got = fn(world0, loc0)
    print(name, "max_err", float(jnp.abs(got - ref).max()))

for name, fn in VARIANTS.items():
    @jax.jit
    def run(world, key, fn=fn):
        def body(carry, k):
            w, loc = carry
            w = w * 0.999 + 0.001
            # mutate loc each step (random walk, clamped in range)
            d = jax.random.randint(k, loc.shape, -1, 2)
            loc = jnp.clip(loc + d, K, jnp.array([R - K - 1, C - K - 1]))
            crop = fn(w, loc)
            return (w, loc), crop.sum()
        (w, loc), s = jax.lax.scan(body, (world, loc0),
                                   jax.random.split(key, steps))
        return w, s.sum()
    w, s = run(world0, jax.random.PRNGKey(1)); float(s)
    t0 = time.time()
    for i in range(reps):
        w, s = run(world0, jax.random.PRNGKey(i)); float(s)
    dt = time.time() - t0
    print(name, round(B * steps * reps / dt / 1e6, 2), "M env-steps/s of crop")


def crop_anchor(world, loc):
    # one-hot only over VALID anchor positions; windows by static slices
    ra, ca = R - 2 * K, C - 2 * K
    row_stack = jnp.stack([world[:, a:a + 2 * K + 1] for a in range(ra)], 1)
    sel_row = jax.nn.one_hot(loc[..., 0] - K, ra)            # [B, N, ra]
    rows = (sel_row[..., None, None, None] *
            row_stack[:, None]).sum(2)                       # [B, N, 5, C, H]
    col_stack = jnp.stack([rows[:, :, :, b:b + 2 * K + 1]
                           for b in range(ca)], 2)           # [B,N,ca,5,5,H]
    sel_col = jax.nn.one_hot(loc[..., 1] - K, ca)
    return (sel_col[..., None, None, None] * col_stack).sum(2)


print("anchor max_err", float(jnp.abs(crop_anchor(world0, loc0) - ref).max()))
for name, fn in {"anchor": crop_anchor}.items():
    @jax.jit
    def run(world, key, fn=fn):
        def body(carry, k):
            w, loc = carry
            w = w * 0.999 + 0.001
            d = jax.random.randint(k, loc.shape, -1, 2)
            loc = jnp.clip(loc + d, K, jnp.array([R - K - 1, C - K - 1]))
            crop = fn(w, loc)
            return (w, loc), crop.sum()
        (w, loc), s = jax.lax.scan(body, (world, loc0),
                                   jax.random.split(key, steps))
        return w, s.sum()
    w, s = run(world0, jax.random.PRNGKey(1)); float(s)
    t0 = time.time()
    for i in range(reps):
        w, s = run(world0, jax.random.PRNGKey(i)); float(s)
    dt = time.time() - t0
    print(name, round(B * steps * reps / dt / 1e6, 2), "M env-steps/s of crop")
