"""s3prl-style upstream expert: the L0 export API.

Reproduces the reference upstream contract (reference fithubert/expert.py:
9-75): construct the trained student from a (checkpoint, dumped-yaml) pair
with projection heads dropped — the LAST layer-wise head is kept as
`final_proj` (reference modules/model.py:393-399) — and expose

    forward(wavs: list of 1-D float arrays) ->
        {'last_hidden_state': (B, T, 768) @ 50 Hz,
         'hidden_states':     tuple of per-layer (B, T', D) hiddens}
    get_downsample_rates(key) -> 320      (reference fithubert/expert.py:49-50)

Accepts BOTH our export pair (student.yaml + student.msgpack, written by
train/checkpoint.py:export_student) and the reference's released
pytorch-lightning `.ckpt` files (imported via export/reference_import.py).

TPU notes: the padded batch length is quantized to a small set of shapes so
repeated calls hit the XLA compile cache; one jitted apply serves all buckets.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

from fithubert_tpu.config import ExperimentConfig, load_yaml_config


from fithubert_tpu.data.librispeech import quantize_length as _quantize_len


class UpstreamExpert:
    def __init__(
        self,
        ckpt: str,
        model_config: str,
        length_quantum: int = 16000,
        # serve with dynamic-int8 MXU matmuls (ops/quant.py). The weights are
        # re-quantized inside each jitted forward (params are jit ARGUMENTS,
        # so XLA cannot fold the per-channel amax/round) — one elementwise
        # pass over ~22M weights, <1% of a batched forward; accepting that
        # keeps the param tree identical to fp serving (no (w_q, scale)
        # checkpoint surgery, importers untouched).
        int8: bool = False,
        **kwargs,  # s3prl passes hub kwargs (e.g. refresh) through hubconf
    ):
        import jax

        self.length_quantum = length_quantum

        if ckpt.endswith(".ckpt"):  # reference lightning checkpoint
            from fithubert_tpu.export.reference_import import load_reference_student

            cfg, variables = load_reference_student(ckpt, model_config)
        else:  # our export pair
            from fithubert_tpu.train.checkpoint import load_student_export

            cfg = load_yaml_config(model_config)
            variables = load_student_export(ckpt)

        import dataclasses

        from fithubert_tpu.models import StudentModel

        # teacher-init flags off at inference (reference fithubert/expert.py:30-32)
        self.cfg: ExperimentConfig = dataclasses.replace(
            cfg,
            distiller=dataclasses.replace(
                cfg.distiller,
                init_conv_layers=False,
                init_encoder_layers=0,
                quantize_matmuls=bool(int8) or cfg.distiller.quantize_matmuls,
            ),
        )
        self.model = StudentModel(cfg=self.cfg.distiller, disable_projections=True)
        # drop head params except the final one (kept inside the model as
        # final_proj when disable_projections=True)
        params = dict(variables["params"])
        last = f"proj_head_{self.cfg.distiller.encoder_layers - 1}"
        for key in list(params):
            if key.startswith("proj_head_") and key != last:
                del params[key]
        # keep extra collections (conformer batch_stats) alongside params
        self._variables = {**variables, "params": params}

        @jax.jit
        def _forward(variables, wav, mask):
            out = self.model.apply(variables, wav, mask, deterministic=True)
            return out.x, out.padding_mask, [h for (h, _, _) in out.layer_results]

        self._jit_forward = _forward

    def get_downsample_rates(self, key: str = "") -> int:
        return self.cfg.distiller.downsample_rate

    def __call__(self, wavs: Sequence[np.ndarray]) -> Dict[str, Any]:
        return self.forward(wavs)

    def forward(self, wavs: Sequence[np.ndarray]) -> Dict[str, Any]:
        """wavs: list of 1-D float waveforms (16 kHz). Returns the reference
        dict layout (fithubert/expert.py:72-75)."""
        import jax.numpy as jnp

        lengths = [int(np.shape(w)[0]) for w in wavs]
        t_pad = _quantize_len(max(lengths), self.length_quantum)
        batch = np.zeros((len(wavs), t_pad), np.float32)
        mask = np.ones((len(wavs), t_pad), bool)
        for i, (w, n) in enumerate(zip(wavs, lengths)):
            batch[i, :n] = np.asarray(w, np.float32)
            mask[i, :n] = False

        x, pad_mask, hiddens = self._jit_forward(
            self._variables, jnp.asarray(batch), jnp.asarray(mask)
        )
        return {
            "last_hidden_state": np.asarray(x),
            "hidden_states": tuple(np.asarray(h) for h in hiddens),
            "padding_mask": np.asarray(pad_mask) if pad_mask is not None else None,
        }
