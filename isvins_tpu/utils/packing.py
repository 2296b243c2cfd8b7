"""Packed device calls: collapse a pytree-of-arrays call boundary into at
most three host->device buffers (f32 / i32 / bool) and one device->host f32
buffer.

Why: on a remote-accelerator runtime every host<->device transfer is a
latency-bound RPC (~2-25 ms measured through the v5e tunnel), so a jitted
call taking ~37 small pytree leaves and returning ~9 pays tens of
milliseconds of pure latency per frame. Packing turns that into 3 uploads +
1 dispatch + 1 pull regardless of pytree width. The pack/unpack reshuffles
are pure elementwise copies that XLA fuses into the program prologue.

The float payload is cast to `float_dtype` (float32 by default) — for the
steady-state VIO solve this IS the mixed-precision cast (host state stays
float64; the device program computes in f32 on the MXU).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class PackedFn:
    """Wrap `fn(*args) -> out_pytree` (all leaves arrays) as a packed call.

    `example_args` fixes the input pytree structure, shapes and dtypes; the
    wrapped callable accepts numpy (or jax) pytrees with the same structure
    and returns the output pytree as NUMPY arrays. Output leaves must all be
    floating point.
    """

    def __init__(self, fn, example_args, float_dtype=jnp.float32):
        self._float_dtype = float_dtype
        flat, self._in_tree = jax.tree_util.tree_flatten(example_args)
        self._specs = []  # (kind, shape, size)
        sizes = {"f": 0, "i": 0, "b": 0}
        for a in flat:
            a = np.asarray(a)
            if np.issubdtype(a.dtype, np.floating):
                kind = "f"
            elif a.dtype == np.bool_:
                kind = "b"
            else:
                kind = "i"
            self._specs.append((kind, a.shape, int(a.size)))
            sizes[kind] += int(a.size)
        self._sizes = sizes

        out_shape = jax.eval_shape(fn, *example_args)
        oflat, self._out_tree = jax.tree_util.tree_flatten(out_shape)
        self._out_specs = [(o.shape, int(np.prod(o.shape, dtype=np.int64)))
                           for o in oflat]

        def packed(fbuf, ibuf, bbuf):
            leaves = []
            of = oi = ob = 0
            for kind, shape, size in self._specs:
                if kind == "f":
                    leaves.append(fbuf[of:of + size].reshape(shape))
                    of += size
                elif kind == "i":
                    leaves.append(ibuf[oi:oi + size].reshape(shape))
                    oi += size
                else:
                    leaves.append(bbuf[ob:ob + size].reshape(shape))
                    ob += size
            args = jax.tree_util.tree_unflatten(self._in_tree, leaves)
            out = fn(*args)
            oleaves = jax.tree_util.tree_leaves(out)
            return jnp.concatenate([o.reshape(-1) for o in oleaves])

        self._jfn = jax.jit(packed)

    def __call__(self, *args):
        flat = jax.tree_util.tree_leaves(args)
        fs, is_, bs = [], [], []
        for a, (kind, _, _) in zip(flat, self._specs):
            a = np.asarray(a)
            if kind == "f":
                fs.append(a.ravel())
            elif kind == "i":
                is_.append(a.ravel().astype(np.int32))
            else:
                bs.append(a.ravel())
        fdt = np.dtype(self._float_dtype)
        fbuf = (np.concatenate(fs).astype(fdt) if fs
                else np.zeros(0, fdt))
        ibuf = np.concatenate(is_) if is_ else np.zeros(0, np.int32)
        bbuf = np.concatenate(bs) if bs else np.zeros(0, bool)
        # NOTE: issuing copy_to_host_async here before blocking measured
        # SLOWER on the remote runtime (+26 ms/frame: the early copy request
        # adds its own round trip when there is no host work to overlap it
        # with); the tracker's dispatch/collect split is where the async copy
        # pays off
        out = np.asarray(self._jfn(fbuf, ibuf, bbuf), dtype=np.float64)
        res = []
        off = 0
        for shape, size in self._out_specs:
            res.append(out[off:off + size].reshape(shape))
            off += size
        return jax.tree_util.tree_unflatten(self._out_tree, res)
