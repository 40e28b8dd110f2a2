"""Probe the cost of whole-DeviceGraph passthrough programs on axon.

wave_insert_level returns the full DeviceGraph (donated); if the runtime
does not honor input-output aliasing, every wave pays a copy / buffer
round-trip for ~500 MB of untouched arrays. Compare:
  a) donated full-graph passthrough (builder-shaped)
  b) same program returning only the mutated table
  c) activate_wave as shipped

Usage: python scripts/check_passthrough.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hannoy_tpu.build import wave_ops
from hannoy_tpu.models.hnsw import HostGraph, slot_capacity, to_device
from hannoy_tpu.ops import codecs, distances

N, D = 100_000, 768
metric = distances.by_name("cosine")
g = HostGraph.empty(metric, D, 16, 32, capacity=slot_capacity(N))
for i in range(N):
    g.alloc_slot(i)
rng = np.random.default_rng(0)
g.vectors[:N] = codecs.pack(rng.standard_normal((N, D)).astype(np.float32), metric.codec)
g.norms[:N] = distances.np_norms(metric, g.vectors[:N])
g.ensure_layers(1)
for s in range(0, N, 16):
    g.upper_row(1, s)


@partial(jax.jit, donate_argnames=("g",))
def full_passthrough(g, wave):
    safe = jnp.where(wave >= 0, wave, g.capacity)
    return wave_ops._replace(g, valid=g.valid.at[safe].set(True, mode="drop"))


@jax.jit
def valid_only(valid, wave, capacity):
    safe = jnp.where(wave >= 0, wave, capacity)
    return valid.at[safe].set(True, mode="drop")


def timeit(name, fn, reps=8):
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum() if hasattr(jax.tree_util.tree_leaves(out)[0], "sum") else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.1f} ms", flush=True)
    return out


wave = jnp.asarray(np.arange(4096, dtype=np.int32))

dev = to_device(g)
state = [dev]


def run_full():
    state[0] = full_passthrough(state[0], wave)
    return state[0].valid


timeit("donated full-graph passthrough", run_full)

dev2 = to_device(g)
vstate = [dev2.valid]


def run_valid():
    vstate[0] = valid_only(vstate[0], wave, dev2.capacity)
    return vstate[0]


timeit("valid-only scatter", run_valid)

dev3 = to_device(g)
astate = [dev3]


def run_activate():
    astate[0] = wave_ops.activate_wave(astate[0], wave)
    return astate[0].valid


timeit("activate_wave (shipped)", run_activate)
