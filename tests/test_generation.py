"""Generation correctness: incremental cached decode must match the full
teacher-forced forward, greedy must follow argmax, beam(K=1) ≈ greedy."""

import jax
import jax.numpy as jnp
import numpy as np

from vlpet_tpu.config import BartConfig, VLModelConfig, VisConfig, vlpet_recipe
from vlpet_tpu.models.generate import (
    greedy_generate,
    init_self_cache,
    seq2seq_generate,
)
from vlpet_tpu.models.vlbart import VLBart
from vlpet_tpu.pet.modules import PetContext


def tiny_cfg(pet=None):
    return VLModelConfig(
        backbone=BartConfig(vocab_size=50, d_model=32, encoder_layers=2,
                            decoder_layers=2, encoder_attention_heads=4,
                            decoder_attention_heads=4, encoder_ffn_dim=64,
                            decoder_ffn_dim=64, max_position_embeddings=64),
        vis=VisConfig(feat_dim=16, n_boxes=4),
        pet=pet or vlpet_recipe("large", r=8, num_heads=4, gate_dim=8))


def make_model_and_batch(seed=0, B=2):
    cfg = tiny_cfg()
    m = VLBart(cfg)
    rng = np.random.default_rng(seed)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(3, 50, (B, 5)), jnp.int32),
        attention_mask=jnp.ones((B, 5), jnp.int32),
        vis_feats=jnp.asarray(rng.normal(size=(B, 4, 16)), jnp.float32),
        boxes=jnp.asarray(rng.uniform(size=(B, 4, 4)), jnp.float32),
    )
    variables = m.init(jax.random.PRNGKey(seed), **batch,
                       labels=jnp.ones((B, 3), jnp.int32))
    return m, variables, batch, cfg


class TestCacheParity:
    def test_incremental_equals_full_forward(self):
        m, variables, batch, cfg = make_model_and_batch()
        B, T = 2, 6
        ctx = PetContext()
        dec_ids = jnp.asarray(np.random.default_rng(1).integers(3, 50, (B, T)),
                              jnp.int32)
        enc_out, joint_mask = m.apply(variables, batch["input_ids"],
                                      batch["attention_mask"],
                                      batch["vis_feats"], batch["boxes"],
                                      None, None, None, ctx,
                                      method=VLBart.encode)
        full_logits = m.apply(variables, dec_ids, enc_out, joint_mask, ctx,
                              method=VLBart.decode_train)
        cross_kvs = m.apply(variables, enc_out, ctx, method=VLBart.init_decode)
        cache = init_self_cache(cfg, B, T)
        step_logits = []
        for t in range(T):
            lg, cache = m.apply(variables, dec_ids[:, t:t + 1], joint_mask,
                                cross_kvs, cache, t, ctx,
                                method=VLBart.decode_step)
            step_logits.append(lg)
        step_logits = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(full_logits), rtol=2e-4, atol=2e-4)


class TestGreedy:
    def test_greedy_matches_manual_argmax(self):
        m, variables, batch, cfg = make_model_and_batch()
        ctx = PetContext()
        out = seq2seq_generate(m, variables, **batch, ctx=ctx, num_beams=1,
                               max_length=8)
        assert out.shape == (2, 8)
        assert np.all(np.asarray(out[:, 0]) == cfg.backbone.decoder_start_token_id)
        # manual loop via teacher forcing
        enc_out, joint_mask = m.apply(variables, batch["input_ids"],
                                      batch["attention_mask"],
                                      batch["vis_feats"], batch["boxes"],
                                      None, None, None, ctx, method=VLBart.encode)
        seq = [cfg.backbone.decoder_start_token_id] * 1
        finished = [False, False]
        seqs = np.full((2, 8), cfg.backbone.pad_token_id)
        seqs[:, 0] = cfg.backbone.decoder_start_token_id
        for t in range(7):
            logits = m.apply(variables, jnp.asarray(seqs[:, :t + 1]), enc_out,
                             joint_mask, ctx, method=VLBart.decode_train)
            nxt = np.argmax(np.asarray(logits[:, -1]), axis=-1)
            for b in range(2):
                if not finished[b]:
                    seqs[b, t + 1] = nxt[b]
                    if nxt[b] == cfg.backbone.eos_token_id:
                        finished[b] = True
            if all(finished):
                break
        np.testing.assert_array_equal(np.asarray(out), seqs)


class TestVisAttentionMask:
    def test_generation_respects_vis_mask(self):
        """Generating with a partially-masked vis sequence must match the
        teacher-forced forward given the same mask (VERDICT r1 #6: the mask
        used to be dropped at generation)."""
        m, variables, batch, cfg = make_model_and_batch(seed=5)
        B = 2
        vis_mask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.int32)
        out = seq2seq_generate(m, variables, **batch,
                               vis_attention_mask=vis_mask, ctx=PetContext(),
                               num_beams=1, max_length=8)
        # manual argmax loop through the full forward with the same mask
        ctx = PetContext()
        enc_out, joint_mask = m.apply(variables, batch["input_ids"],
                                      batch["attention_mask"],
                                      batch["vis_feats"], batch["boxes"],
                                      None, None, vis_mask, ctx,
                                      method=VLBart.encode)
        seqs = np.full((B, 8), cfg.backbone.pad_token_id)
        seqs[:, 0] = cfg.backbone.decoder_start_token_id
        finished = [False] * B
        for t in range(7):
            logits = m.apply(variables, jnp.asarray(seqs[:, :t + 1]), enc_out,
                             joint_mask, ctx, method=VLBart.decode_train)
            nxt = np.argmax(np.asarray(logits[:, -1]), axis=-1)
            for b in range(B):
                if not finished[b]:
                    seqs[b, t + 1] = nxt[b]
                    if nxt[b] == cfg.backbone.eos_token_id:
                        finished[b] = True
            if all(finished):
                break
        np.testing.assert_array_equal(np.asarray(out), seqs)
        # and the mask must actually reach attention: first-step logits differ
        # from the unmasked forward
        enc_out2, joint_mask2 = m.apply(variables, batch["input_ids"],
                                        batch["attention_mask"],
                                        batch["vis_feats"], batch["boxes"],
                                        None, None, None, ctx,
                                        method=VLBart.encode)
        dec = jnp.asarray(seqs[:, :1])
        l_masked = m.apply(variables, dec, enc_out, joint_mask, ctx,
                           method=VLBart.decode_train)
        l_nomask = m.apply(variables, dec, enc_out2, joint_mask2, ctx,
                           method=VLBart.decode_train)
        assert not np.allclose(np.asarray(l_masked), np.asarray(l_nomask))


class TestBeam:
    def test_beam1_matches_greedy(self):
        m, variables, batch, _ = make_model_and_batch()
        ctx = PetContext()
        g = seq2seq_generate(m, variables, **batch, ctx=ctx, num_beams=1,
                             max_length=8)
        b = seq2seq_generate(m, variables, **batch, ctx=ctx, num_beams=1,
                             max_length=8)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(b))

    def test_beam_runs_and_improves_score(self):
        m, variables, batch, cfg = make_model_and_batch()
        ctx = PetContext()
        out5 = seq2seq_generate(m, variables, **batch, ctx=ctx, num_beams=5,
                                max_length=8)
        assert out5.shape == (2, 8)

    def test_beam_score_not_worse_than_greedy(self):
        """Beam-5's sequence log-prob must be >= greedy's (same length norm)."""
        m, variables, batch, cfg = make_model_and_batch(seed=3)
        ctx = PetContext()

        def seq_logprob(seq):
            enc_out, joint_mask = m.apply(variables, batch["input_ids"],
                                          batch["attention_mask"],
                                          batch["vis_feats"], batch["boxes"],
                                          None, None, None, ctx,
                                          method=VLBart.encode)
            logits = m.apply(variables, seq[:, :-1], enc_out, joint_mask, ctx,
                             method=VLBart.decode_train)
            logp = jax.nn.log_softmax(logits, axis=-1)
            tgt = seq[:, 1:]
            tok_lp = np.take_along_axis(np.asarray(logp),
                                        np.asarray(tgt)[..., None], axis=-1)[..., 0]
            pad = cfg.backbone.pad_token_id
            eos = cfg.backbone.eos_token_id
            mask = np.asarray(tgt) != pad
            # include eos, exclude pads after eos
            total, length = [], []
            for b in range(tok_lp.shape[0]):
                lp, m_ = tok_lp[b], mask[b]
                s = 0.0
                n = 0
                for t in range(len(lp)):
                    s += lp[t]
                    n += 1
                    if np.asarray(tgt)[b, t] == eos:
                        break
                total.append(s)
                length.append(n)
            return np.array(total) / np.array(length)

        g = seq_logprob(seq2seq_generate(m, variables, **batch, ctx=ctx,
                                         num_beams=1, max_length=8))
        b = seq_logprob(seq2seq_generate(m, variables, **batch, ctx=ctx,
                                         num_beams=5, max_length=8))
        assert np.all(b >= g - 1e-4), (b, g)


class TestBeamKernelPathParity:
    def test_forced_pallas_beam_path_matches_cpu_fallback(self):
        """E2E seq2seq beam decode through the TPU-only Pallas kernel branch
        (interpret mode + _FORCE_KERNEL) vs the einsum fallback: identical
        output sequences. Covers the ancestry-mode flat mask build
        (beam_sel_big) and the beam-self-attend kernel end to end — on the
        real TPU this branch is the one that runs (B is padded to a
        multiple of 8 by seq2seq_generate)."""
        import vlpet_tpu.ops.decode as D

        m, variables, batch, cfg = make_model_and_batch(B=3)

        def gen():
            return seq2seq_generate(
                m, variables, input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                vis_feats=batch["vis_feats"], boxes=batch["boxes"],
                ctx=PetContext(), num_beams=3, max_length=6)

        want = gen()
        D._INTERPRET, D._FORCE_KERNEL = True, True
        try:
            got = gen()
        finally:
            D._INTERPRET, D._FORCE_KERNEL = False, False
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestExactTopkPaddedVocab:
    """generate.padded_vocab_for_topk: in exact_hier mode the decode-step
    GEMM emits a 128-aligned vocab with _PAD columns so topk_lse_hier's
    per-step HBM pad is dead code (PERF.md "Beam top-k exactness")."""

    def test_helper_gates(self):
        from vlpet_tpu.models import generate as gen
        prev_mode, prev_force = gen.TOPK_MODE, gen._FORCE_PAD
        # on the CPU backend the kernel never runs, so no pad in any mode
        gen.TOPK_MODE = "exact_hier"
        try:
            assert gen.padded_vocab_for_topk(50265, 5) is None  # cpu backend
            gen._FORCE_PAD = True  # emulate the TPU vocab-scale route
            assert gen.padded_vocab_for_topk(50265, 5) == 50304
            assert gen.padded_vocab_for_topk(32128, 5) is None  # aligned (T5)
            # k<=2 routes to the iterative kernel, which never pads
            assert gen.padded_vocab_for_topk(50265, 1) is None
            assert gen.padded_vocab_for_topk(50265, 2) is None
            assert gen.padded_vocab_for_topk(50265, 17) is None  # hier cap
            gen.TOPK_MODE = "approx"
            assert gen.padded_vocab_for_topk(50265, 5) is None  # mode gate
        finally:
            gen.TOPK_MODE, gen._FORCE_PAD = prev_mode, prev_force

    def test_decode_step_topk_pad_equivalence(self):
        """tiny vocab 50 is NOT 128-aligned: under exact_hier the GEMM emits
        width 128 (zero weight rows + _PAD bias); vals/toks/lse must be
        bit-identical to the default unpadded path (CPU routes both modes
        to the same lax.top_k reduction, so the only difference IS the
        pad-at-GEMM)."""
        from vlpet_tpu.models import generate as gen

        m, variables, batch, cfg = make_model_and_batch()
        B, k = 2, 5
        ctx = PetContext()
        enc_out, joint_mask = m.apply(variables, batch["input_ids"],
                                      batch["attention_mask"],
                                      batch["vis_feats"], batch["boxes"],
                                      None, None, None, ctx,
                                      method=VLBart.encode)
        cross_kvs = m.apply(variables, enc_out, ctx, method=VLBart.init_decode)
        tok = jnp.full((B, 1), cfg.backbone.decoder_start_token_id, jnp.int32)

        def step():
            cache = init_self_cache(cfg, B, 4)
            return m.apply(variables, tok, joint_mask, cross_kvs, cache, 0,
                           k, ctx, method=VLBart.decode_step_topk)

        vals0, toks0, lse0, _ = step()
        prev_mode, prev_force = gen.TOPK_MODE, gen._FORCE_PAD
        gen.TOPK_MODE, gen._FORCE_PAD = "exact_hier", True
        try:
            assert gen.padded_vocab_for_topk(50, k) == 128
            vals1, toks1, lse1, _ = step()
        finally:
            gen.TOPK_MODE, gen._FORCE_PAD = prev_mode, prev_force
        np.testing.assert_array_equal(np.asarray(vals0), np.asarray(vals1))
        np.testing.assert_array_equal(np.asarray(toks0), np.asarray(toks1))
        # lse: XLA:CPU's logsumexp reduction ORDER changes with the row
        # width (50 vs 128), a 1-ulp effect. On the TPU exact_hier path the
        # kernel always reduced over the PADDED width (it padded in-kernel
        # before this change), so on-chip lse is bit-unchanged.
        np.testing.assert_allclose(np.asarray(lse0), np.asarray(lse1),
                                   rtol=3e-7, atol=0)
        assert int(np.asarray(toks1).max()) < 50  # pad columns never win
