"""Compile-probe the fused update kernel's actual scoped-VMEM demand at
large extents (cfg5 fine level is 384^3) to calibrate _update_tx.

Usage: python tools/probe_update_vmem.py [N [NC [TX]]]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from varden_tpu.ops import pallas_kernels as pk

n = int(sys.argv[1]) if len(sys.argv) > 1 else 384
nc = int(sys.argv[2]) if len(sys.argv) > 2 else 2
txs = [int(sys.argv[3])] if len(sys.argv) > 3 else [2, 1]

shape = (n, n, n)
sold = jnp.zeros((nc,) + shape, jnp.float32)
force = sold
umac = tuple(jnp.zeros(tuple(s + (1 if d == ax else 0) for ax, s in
                             enumerate(shape)), jnp.float32)
             for d in range(3))
sedge = tuple(jnp.zeros((nc,) + u.shape, jnp.float32) for u in umac)
flux = sedge
is_cons = (True,) * nc

orig = pk._update_tx
for tx in txs:
    pk._update_tx = lambda n_, nc_, _tx=tx: _tx
    try:
        f = jax.jit(lambda a, b, c, d, e: pk.update_3d(
            a, b, c, d, e, jnp.float32(1e-3), (1.0, 1.0, 1.0), is_cons))
        lowered = f.lower(sold, umac, sedge, flux, force)
        compiled = lowered.compile()
        print(f"n={n} nc={nc} tx={tx}: COMPILED OK")
    except Exception as e:
        msg = str(e)
        key = "Scoped allocation with size"
        i = msg.find(key)
        print(f"n={n} nc={nc} tx={tx}: FAIL "
              f"{msg[i:i+120] if i >= 0 else msg[:300]}")
pk._update_tx = orig
