"""Relay-safe device timing: dependent chain + scalar fetch.

The ONLY protocol that yields trustworthy timings through the axon relay
(established in round 2, see bench.py / docs/PLAN.md):

1. Successive calls must form a DATA-DEPENDENT chain — independent
   dispatches closed by `block_until_ready` produce physically impossible
   numbers (block returns before device completion through the relay).
2. The chain must end with a data FETCH (scalar readback), the one sync
   that provably waits for the program.
3. Subtract a measured no-op dispatch+fetch baseline.

`time_device_chained` makes any benchmark function chainable generically:
each step's output perturbs the next step's first argument by
`first_leaf(out) * 1e-30` inside ONE jitted program, so the scheduler sees
a true dependency edge and no out-of-jit ops ride the relay per iteration.
"""

from __future__ import annotations

import time

_FETCH_BASELINE: float | None = None


def fetch_scalar(out) -> float:
    """Force device completion by fetching one element."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0].astype(jnp.float32))


def noop_baseline(reps: int = 5) -> float:
    """Dispatch + scalar-fetch round trip of a no-op jit (cached)."""
    global _FETCH_BASELINE
    if _FETCH_BASELINE is None:
        import jax
        import jax.numpy as jnp

        noop = jax.jit(lambda x: x + 1.0)
        float(noop(jnp.float32(0.0)))
        t0 = time.perf_counter()
        for i in range(reps):
            float(noop(jnp.float32(i)))
        _FETCH_BASELINE = (time.perf_counter() - t0) / reps
    return _FETCH_BASELINE


def time_device_chained(fn, *args, iters: int = 5):
    """Per-call seconds for `fn(*args)` under the chain+fetch protocol.

    Returns (seconds_per_call, out). `fn` must be jit-traceable and its
    first argument a pytree with at least one float leaf (every hot-path
    benchmark here qualifies); non-float leaves pass through unperturbed.
    """
    import jax
    import jax.numpy as jnp

    def _bumped(arg0, out):
        s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
        s = s * jnp.float32(1e-30)

        def bump(x):
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x + s.astype(x.dtype)
            return x

        return jax.tree_util.tree_map(bump, arg0)

    @jax.jit
    def step(arg0, *rest):
        out = fn(arg0, *rest)
        return out, _bumped(arg0, out)

    base = noop_baseline()
    out, arg0 = step(*args)  # compile
    fetch_scalar(out)
    rest = args[1:]

    # Adaptive chain length: the measurement is (1 RTT + N x prog) - RTT̂,
    # and the relay round trip has ~ms jitter — for sub-ms programs a short
    # chain can come out zero or negative (observed: gauss_newton_rays at
    # iters=5). Grow the chain until the raw elapsed time dwarfs the no-op
    # baseline so RTT variance is amortized away.
    for _attempt in range(4):
        arg0 = args[0]
        ran = iters
        t0 = time.perf_counter()
        for _ in range(ran):
            out, arg0 = step(arg0, *rest)
        fetch_scalar(out)
        elapsed = time.perf_counter() - t0
        if elapsed >= 8.0 * base or elapsed >= 2.0:
            break
        iters *= 4
    dt = elapsed - base
    # Floor at 1 us/call: the subtraction can still under-shoot by RTT
    # jitter, and downstream speedup ratios must not divide by zero.
    return max(dt / ran, 1e-6), out
