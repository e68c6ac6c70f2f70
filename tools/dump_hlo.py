"""Dump the optimized HLO of the fused bench program (for profile
attribution: fusion.N names in xplane traces match this text)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_fused


def main():
    batch = int(os.environ.get("B", 32))
    s2d = os.environ.get("S2D", "1") == "1"
    out = os.environ.get("OUT", "/tmp/fused_hlo.txt")
    nblk = int(os.environ.get("NBLK", 2))
    fused_raw, gp, dp = build_fused(10, s2d=s2d, n_block_stages=nblk)

    def fused_sum(gp, dp, z, rng):
        img, mask = fused_raw(gp, dp, z, rng)
        return jnp.sum(img.astype(jnp.int32)) + jnp.sum(mask.astype(jnp.int32))

    z = jnp.zeros((batch, 512))
    rng = jax.random.PRNGKey(0)
    comp = jax.jit(fused_sum).lower(gp, dp, z, rng).compile()
    with open(out, "w") as fp:
        fp.write(comp.as_text())
    print("wrote", out, os.path.getsize(out), "bytes", flush=True)


if __name__ == "__main__":
    main()
