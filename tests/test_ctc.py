"""CTC fine-tune path: text utilities, pseudo-label collapse, and the
task-specific train step (SURVEY.md §2.10 / §7 step 8 — implemented WORKING;
the reference's path crashes, SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fithubert_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LossConfig,
    StudentConfig,
    TeacherConfig,
    TrainConfig,
)
from fithubert_tpu.utils.text import (
    GreedyCTCDecoder,
    LetterDictionary,
    cer,
    ctc_collapse,
    default_dict_path,
    edit_distance,
    wer,
)


def test_letter_dictionary_matches_reference_table():
    # the reference hard-codes this table (utils/utils.py:25-28)
    d = LetterDictionary()
    assert d.indices["<s>"] == 0
    assert d.indices["|"] == 4
    assert d.indices["E"] == 5
    assert d.indices["Z"] == 31
    assert len(d) == 32


def test_letter_dictionary_load_file():
    d = LetterDictionary.load(default_dict_path())
    assert len(d) == 32
    assert d.indices["|"] == 4 and d.indices["Z"] == 31


def test_encode_decode_roundtrip():
    d = LetterDictionary()
    dec = GreedyCTCDecoder(d)
    ids = d.encode("HELLO WORLD")
    # decoding collapses consecutive duplicates -> LL becomes L; interleave
    # blanks like a CTC alignment to preserve them
    interleaved = []
    for i in ids:
        interleaved += [i, 0]
    assert dec.decode(interleaved) == "HELLO WORLD"


def test_greedy_decoder_collapse_semantics():
    dec = GreedyCTCDecoder()
    # <s>=0 blank, E=5, T=6, |=4
    assert dec.decode([0, 5, 5, 0, 6, 4, 6, 6, 0]) == "ET T"


def test_ctc_collapse():
    assert ctc_collapse([0, 1, 1, 0, 2, 2, 3, 0, 3]) == [1, 2, 3, 3]


def test_edit_distance_and_rates():
    assert edit_distance("kitten", "sitting") == 3
    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)


def test_collapse_pseudo_labels_matches_python():
    from fithubert_tpu.train.losses import collapse_pseudo_labels

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 5, size=(4, 37))
    labels, pads = jax.jit(collapse_pseudo_labels)(jnp.asarray(ids))
    for b in range(4):
        want = ctc_collapse(list(ids[b]))
        n = int((1 - pads[b]).sum())
        assert list(np.asarray(labels[b, :n])) == want
        assert np.all(np.asarray(labels[b, n:]) == 0)


def _ctc_config():
    return ExperimentConfig(
        teacher=TeacherConfig(
            teacher_model="", model_type="wav2vec_ctc", encoder_layers=2,
            encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, vocab_size=32,
        ),
        train=TrainConfig(batch_size=2, accumulate_grad_batches=1),
        loss=LossConfig(
            rec_loss_weight=1.0, rec_loss_type="l1", sim_loss_weight=0.0,
            distil_random_layer=0, ctc_loss_weight=1.0, use_gt_for_ctc=True,
        ),
        # student head dim = teacher vocab so x is the CTC logits
        # (reference train.py:383 log_softmax over student x)
        distiller=StudentConfig(
            # stride product 320 to match the default teacher front-end
            conv_feature_layers=((16, 10, 5), (32, 8, 4), (32, 4, 4), (32, 4, 4)),
            conv_pos=16, conv_pos_groups=4,
            encoder_layers=2, encoder_embed_dim=32, encoder_ffn_embed_dim=64,
            encoder_attention_heads=4, dropout=0.0, attention_dropout=0.0,
            dropout_input=0.0, pred_head_final_dim=32, pred_layer_id=(1,),
            layerwise_proj=True, enable_tr_layer=True, tr_layer_type="conv1d",
            tr_layer_index=0, tr_reduce_factor=2, use_pallas_attention=False,
            teacher_task_agnostic=False,
        ),
        data=DataConfig(synthetic=True, load_labels=True,
                        synthetic_wav_length=4000, length_quantum=2000,
                        synthetic_num_batches=2),
    )


@pytest.mark.slow
def test_ctc_train_step_gt_and_pseudo():
    from fithubert_tpu.data import make_dataset
    from fithubert_tpu.parallel import make_mesh
    from fithubert_tpu.train.step import Distiller

    cfg = _ctc_config()
    mesh = make_mesh(1)
    data = make_dataset(cfg.data, ("synth",), cfg.train.batch_size)
    batch = next(iter(data.epoch(0)))
    assert "labels" in batch and "_transcripts" in batch

    for use_gt in (True, False):
        c = dataclasses.replace(cfg, loss=dataclasses.replace(cfg.loss, use_gt_for_ctc=use_gt))
        distiller = Distiller(c, mesh=mesh, num_training_steps=4)
        rng = jax.random.PRNGKey(0)
        wav = jnp.asarray(batch["x"][0])
        teacher_params = distiller.init_teacher_params(rng, wav)
        state = distiller.init_state(jax.random.fold_in(rng, 1), wav)
        step = distiller.make_train_step()
        dev_batch = {
            k: jnp.asarray(v) for k, v in batch.items() if not k.startswith("_")
        }
        state, logs = step(
            state, teacher_params, dev_batch,
            jnp.zeros((0,), jnp.int32), jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(logs["loss"]))
        assert "ctc_loss" in logs
        assert float(logs["ctc_loss"]) > 0


def test_predict_step_and_metrics():
    from fithubert_tpu.data import make_dataset
    from fithubert_tpu.parallel import make_mesh
    from fithubert_tpu.train.step import Distiller

    cfg = _ctc_config()
    mesh = make_mesh(1)
    data = make_dataset(cfg.data, ("synth",), cfg.train.batch_size)
    batch = next(iter(data.epoch(0)))
    distiller = Distiller(cfg, mesh=mesh, num_training_steps=4)
    rng = jax.random.PRNGKey(0)
    wav = jnp.asarray(batch["x"][0])
    state = distiller.init_state(rng, wav)
    predict = distiller.make_predict_step()
    ids, _mask = predict(
        state, {"x": wav, "padding_mask": jnp.asarray(batch["padding_mask"][0])}
    )
    dec = GreedyCTCDecoder()
    hyps = [dec.decode(row) for row in np.asarray(ids)]
    refs = batch["_transcripts"][0]
    assert len(hyps) == len(refs)
    assert 0.0 <= wer(refs, hyps)  # random net: just runs end to end
