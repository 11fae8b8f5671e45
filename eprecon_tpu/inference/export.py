"""AOT serving artifacts for the fragment forward (jax.export / StableHLO).

Serializes the COMPLETE per-fragment inference program —
`pipeline.fragment_forward`: dual backbones → occupancy init → 3-stage
coarse-to-fine with GRU fusion → panoptic decoder + post-processing →
direct-substitute global fusion — into one portable StableHLO artifact.
A serving process deserializes and calls it without the model's Python
code; with `platforms=("tpu", "cpu")` the same artifact runs on either.

This is the TPU-native upgrade of the reference's deployment flow, which
ships a pickled state_dict and re-instantiates the full Python/CUDA stack
to serve it (reference main.py:343-348, 362-367): here the *compiled
program* is the deployable, weights stay separate (orbax checkpoints or an
imported reference checkpoint — tools/import_reference_weights.py), and the
call convention is a pure function
`(variables, imgs, frag, rec_state, pmap_state) -> (outputs, losses,
rec_state, pmap_state)` — the exact jitted program StreamingReconstructor
runs online (shared implementation, parity by construction;
tests/test_export.py asserts it numerically).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from eprecon_tpu.config import Config
from eprecon_tpu.models.eprecon import (EPRecon, FragmentInputs,
                                        RecurrentState, make_recurrent_state)
from eprecon_tpu.models.gru_fusion import (DenseGlobalLevel, DenseTargetLevel,
                                           PanopticGlobalDense)
from eprecon_tpu.inference.pipeline import fragment_forward

_registered = False


def _register_serialization() -> None:
    """jax.export serializes custom pytree nodes only after an explicit
    registration with a stable name; NamedTuples in the calling convention
    (fragment inputs + recurrent/global state) all need one."""
    global _registered
    if _registered:
        return
    for nt in (FragmentInputs, RecurrentState, DenseGlobalLevel,
               DenseTargetLevel, PanopticGlobalDense):
        try:
            jexport.register_namedtuple_serialization(
                nt, serialized_name=f"eprecon_tpu.{nt.__name__}")
        except ValueError:
            pass  # already registered in this process
    _registered = True


def _specs(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def export_fragment_forward(cfg: Config, variables, imgs, frag:
                            FragmentInputs,
                            platforms: Tuple[str, ...] = ("tpu", "cpu")
                            ) -> jexport.Exported:
    """Lower + export the fragment forward for `platforms`.

    `imgs`/`frag` fix the static shapes (views, resolution); only their
    shapes/dtypes are used. Cross-platform lowering means a TPU artifact can
    be produced on a CPU-only build machine.
    """
    _register_serialization()
    model = EPRecon(cfg.model)

    def fn(variables, imgs, frag, rec_state, pmap_state):
        return fragment_forward(model, cfg, variables, imgs, frag,
                                rec_state, pmap_state, None)

    rec = make_recurrent_state(cfg.model)
    pmap = PanopticGlobalDense.empty(tuple(cfg.model.global_extent))
    args = (variables, jnp.asarray(imgs), frag, rec, pmap)
    return jexport.export(jax.jit(fn), platforms=list(platforms))(
        *_specs(args))


def save_serving_artifact(path: str, exported: jexport.Exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_serving_artifact(path: str):
    """Returns the deserialized Exported; invoke via `.call(variables, imgs,
    frag, rec_state, pmap_state)` (jit-traceable, shardable)."""
    _register_serialization()
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))
