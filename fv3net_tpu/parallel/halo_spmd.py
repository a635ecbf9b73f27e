"""Explicit ppermute halo exchange over the face-sharded device mesh.

This is the production multi-chip halo path (SURVEY 2.3, 7 Phase 2):
instead of letting the XLA SPMD partitioner turn the single-device
flat gathers (grid/halo.py:65) into all-gathers over the whole cube,
each face shard sends exactly its edge strips to its topological
neighbors as `jax.lax.ppermute` neighbor exchanges that ride the ICI
links -- the TPU equivalent of FMS `mpp_update_domains` halo updates.

Design: all orientation handling happens on the SENDER.  For every
halo block of the padded array (4 edge strips + 4 corner blocks) the
static topology tables (grid/topology.py halo_source_indices[_filled])
say which interior cells of which neighbor face supply it; the sender
gathers those cells pre-rotated into the receiver's index order, one
ppermute ships them, and the receiver concatenates -- no per-receiver
reshuffling.  Where one face sources several receivers for the same
block type (cube corners), the exchange is split into rounds with
unique senders and the rounds summed (non-participating destinations
receive zeros).

The gather tables are numpy compile-time constants; the only runtime
communication is 8 ppermutes of O(h*n) strips per field.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..grid import topology as topo


@dataclasses.dataclass(frozen=True)
class _Round:
    """One ppermute round for a halo block: each sender appears once."""

    perm: Tuple[Tuple[int, int], ...]  # (src_face, dst_face)
    tbl_stack: np.ndarray  # [6, block_cells] local flat gather indices


def _blocks(n: int, h: int):
    N = n + 2 * h
    return {
        "S": (slice(0, h), slice(h, h + n)),
        "N": (slice(h + n, N), slice(h, h + n)),
        "W": (slice(h, h + n), slice(0, h)),
        "E": (slice(h, h + n), slice(h + n, N)),
        "SW": (slice(0, h), slice(0, h)),
        "SE": (slice(0, h), slice(h + n, N)),
        "NW": (slice(h + n, N), slice(0, h)),
        "NE": (slice(h + n, N), slice(h + n, N)),
    }


@lru_cache(maxsize=None)
def _exchange_plan(n: int, h: int, fill: str):
    """Rounds for every halo block, from the topology tables."""
    if fill == "none":
        src_face, src_j, src_i, _ = topo.halo_source_indices(n, h)
    else:
        src_face, src_j, src_i, _ = topo.halo_source_indices_filled(
            n, h, fill
        )
    plan: Dict[str, List[_Round]] = {}
    for name, (rows, cols) in _blocks(n, h).items():
        sf = src_face[:, rows, cols]  # [6, bh, bw] per receiver
        sj = src_j[:, rows, cols]
        si = src_i[:, rows, cols]
        bh, bw = sf.shape[1], sf.shape[2]
        # cells whose source is the receiver itself (clipped fill-none
        # corners referencing own edge cells) need no communication;
        # handled as a self-pair in a round.
        per_recv = []
        for f in range(6):
            faces = np.unique(sf[f])
            if len(faces) != 1:
                raise NotImplementedError(
                    f"halo block {name} of face {f} has mixed "
                    f"sources {faces}; split-by-source not needed "
                    "for the FV3 topology"
                )
            g = int(faces[0])
            tbl = (sj[f] * n + si[f]).astype(np.int32).ravel()
            per_recv.append((g, tbl))
        # group receivers into rounds with unique senders
        rounds: List[_Round] = []
        remaining = list(range(6))
        while remaining:
            used, perm, batch = set(), [], {}
            rest = []
            for f in remaining:
                g, tbl = per_recv[f]
                if g in used:
                    rest.append(f)
                    continue
                used.add(g)
                perm.append((g, f))
                batch[g] = tbl
            tbl_stack = np.zeros((6, bh * bw), np.int32)
            for g, tbl in batch.items():
                tbl_stack[g] = tbl
            rounds.append(_Round(tuple(perm), tbl_stack))
            remaining = rest
        plan[name] = rounds
    return plan, (n, h)


def halo_exchange_spmd(field, h: int, mesh: Mesh, fill: str = "none"):
    """Pad a face-sharded scalar [6, ..., n, n] with h halo cells using
    shard_map + ppermute neighbor exchanges.

    Semantically identical to grid.halo.halo_exchange (same topology
    tables); communication is edge strips over the mesh's "face" axis
    instead of SPMD-partitioned global gathers.
    """
    n = field.shape[-1]
    if dict(mesh.shape).get("face") != 6:
        raise ValueError(
            "halo_exchange_spmd needs a mesh with a 6-way 'face' axis"
        )
    plan, _ = _exchange_plan(n, h, fill)
    ndim = field.ndim
    spec = P("face", *([None] * (ndim - 1)))

    def body(x):
        local = x[0]  # [..., n, n]
        lead = local.shape[:-2]
        flat = local.reshape(lead + (n * n,))
        fidx = jax.lax.axis_index("face")

        def fetch(name, bh, bw):
            total = None
            for rnd in plan[name]:
                tbl = jnp.asarray(rnd.tbl_stack)[fidx]
                send = jnp.take(flat, tbl, axis=-1)
                # self-pairs short-circuit (no ICI hop for clipped
                # own-face corner fills)
                self_pairs = all(s == d for s, d in rnd.perm)
                if self_pairs:
                    recv = send
                else:
                    recv = jax.lax.ppermute(
                        send, "face", list(rnd.perm)
                    )
                total = recv if total is None else total + recv
            return total.reshape(lead + (bh, bw))

        w = fetch("W", n, h)
        e = fetch("E", n, h)
        s = fetch("S", h, n)
        nb = fetch("N", h, n)
        sw = fetch("SW", h, h)
        se = fetch("SE", h, h)
        nw = fetch("NW", h, h)
        ne = fetch("NE", h, h)
        mid = jnp.concatenate([w, local, e], axis=-1)
        bot = jnp.concatenate([sw, s, se], axis=-1)
        top = jnp.concatenate([nw, nb, ne], axis=-1)
        out = jnp.concatenate([bot, mid, top], axis=-2)
        return out[None]

    return jax.shard_map(
        body, mesh=mesh, in_specs=spec, out_specs=spec
    )(field)
