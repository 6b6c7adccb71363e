"""Spatially-partitioned inference (the conv-net analog of sequence
parallelism): activations shard on H over the ``sp`` mesh axis and GSPMD
inserts the conv/pool halo exchanges. int32-accum int16 convs are
deterministic, so the sharded run must reproduce the replicated head
BIT-FOR-BIT — same criterion as the tp stage of the multichip dryrun.

Runs on the virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from yolotpu.models import yolov2 as m
from yolotpu.models import zoo
from yolotpu.parallel import mesh as pmesh
from yolotpu.quant import calibrate_activations, quantize_weights
from yolotpu.weights import WeightStore

pytestmark = pytest.mark.slow


def test_sp_sharded_int16_head_bitequal():
    mesh = pmesh.make_mesh_sp(8)        # dp=2, sp=4
    assert dict(mesh.shape) == {"dp": 2, "sp": 4}

    S = 64                              # sharded H = 16 rows/device at entry
    spec = zoo.build("yolov2", width=S, height=S)
    store = WeightStore.synthetic(spec, seed=0)
    rng = np.random.default_rng(0)
    calib = [rng.random((3, S, S)).astype(np.float32)]
    act_q = calibrate_activations(spec, store, calib)
    quantize_weights(store, act_q)
    params = m.params_int16(spec, store)
    fwd = m.build_forward(spec, "int16", store.qtables, compute="int32",
                          outputs=("head",), mesh=mesh)

    x = jnp.asarray(rng.random((4, S, S, 3), dtype=np.float32))
    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(lambda v: jax.device_put(v, repl),
                                    params)

    want = np.asarray(jax.jit(lambda p, v: fwd(p, v))(
        params, jax.device_put(x, repl))["head"])

    x_sp = jax.device_put(x, pmesh.spatial_batch_sharding(mesh))
    got_out = jax.jit(lambda p, v: fwd(p, v))(params, x_sp)
    got = np.asarray(got_out["head"])
    np.testing.assert_array_equal(got, want)
