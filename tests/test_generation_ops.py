"""com.microsoft GreedySearch — ORT's in-graph autoregressive generation.

onnxruntime's ``convert_generation.py`` wraps an entire GPT decoder in one
node whose ``decoder`` attribute is the per-step subgraph (input_ids /
position_ids / attention_mask / past_* → logits / present_*); the
reference consumes such files whole via ort (src/classifier.rs:348-350).
These tests export that subgraph from a genuine HF GPT-2 through
libtorch's serializer, splice it into a GreedySearch model through the
wire codec, and require the op's device-resident loop (fixed max_length
cache buffers + lax.while_loop) to reproduce an independent torch greedy
loop token-for-token — including CTRL-style repetition penalty,
min_length EOS suppression, vocab masking, early stop, and padding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from _torch_export import export_onnx_bytes  # noqa: E402
from birdnet_tpu.compiler.importer import import_onnx, make_forward  # noqa: E402
from birdnet_tpu.onnx import proto as P  # noqa: E402

MS = "com.microsoft"


def _tiny_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=50,
        n_positions=64, attn_implementation="eager",
    )
    return GPT2LMHeadModel(cfg)


class _StepGraph(torch.nn.Module):
    """The convert_generation.py decoder-subgraph signature: int32
    input_ids / position_ids, (B, total) attention_mask, stacked
    [2,B,N,P,H] pasts; logits + stacked presents out."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, pos, mask, past_0, past_1):
        from transformers.cache_utils import DynamicCache

        cache = DynamicCache()
        cache.update(past_0[0], past_0[1], 0)
        cache.update(past_1[0], past_1[1], 1)
        out = self.m(
            input_ids=ids.long(), position_ids=pos.long(),
            attention_mask=mask.long(), past_key_values=cache,
            use_cache=True,
        )
        pres = out.past_key_values
        return (
            out.logits,
            torch.stack([pres.layers[0].keys, pres.layers[0].values]),
            torch.stack([pres.layers[1].keys, pres.layers[1].values]),
        )


def _export_step_graph(m, b_sz=2):
    ids = torch.randint(0, 50, (b_sz, 1), dtype=torch.int32)
    pos = torch.full((b_sz, 1), 5, dtype=torch.int32)
    mask = torch.ones(b_sz, 6, dtype=torch.int32)
    pasts = [torch.randn(2, b_sz, 2, 5, 16) for _ in range(2)]
    names = ["input_ids", "position_ids", "attention_mask",
             "past_0", "past_1"]
    dyn = {  # batch-polymorphic, like real convert_generation exports:
        # BeamSearch runs the same subgraph at batch*num_beams rows
        "input_ids": {0: "batch", 1: "seq"},
        "position_ids": {0: "batch", 1: "seq"},
        "attention_mask": {0: "batch", 1: "total"},
        "past_0": {1: "batch", 3: "past"},
        "past_1": {1: "batch", 3: "past"},
    }
    data = export_onnx_bytes(
        _StepGraph(m), (ids, pos, mask, *pasts), opset_version=17,
        input_names=names, output_names=["logits", "present_0", "present_1"],
        dynamic_axes=dyn,
    )
    return P.decode_model(data).graph


def _greedy_model(decoder_graph, *, eos, pad, with_vocab_mask=False):
    inputs = ["input_ids", "max_length", "min_length", "repetition_penalty"]
    if with_vocab_mask:
        inputs.append("vocab_mask")
    node = P.make_node(
        "GreedySearch", inputs, ["sequences"], domain=MS,
        decoder=decoder_graph, eos_token_id=eos, pad_token_id=pad,
        model_type=0,
    )
    I32, I64, F = P.DataType.INT32, P.DataType.INT64, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [2, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
    ]
    if with_vocab_mask:
        vis.append(P.make_value_info("vocab_mask", I32, [50]))
    graph = P.GraphProto(
        name="gpt2_greedy", node=[node], input=vis,
        output=[P.make_value_info("sequences", I32, [2, "max_length"])],
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def _torch_greedy(m, prompt, *, max_len, min_len, rep_pen, eos, pad,
                  vocab_mask=None):
    """Independent greedy reference with a TRUE growing cache."""
    from transformers.cache_utils import DynamicCache

    b_sz, s0 = prompt.shape
    out = np.full((b_sz, max_len), pad, np.int32)
    out[:, :s0] = prompt.numpy()
    seen = [set(prompt[b].tolist()) for b in range(b_sz)]
    done = [False] * b_sz
    cache = DynamicCache()
    cur = prompt
    with torch.no_grad():
        for t in range(s0, max_len):
            o = m(input_ids=cur.long(), past_key_values=cache,
                  use_cache=True)
            cache = o.past_key_values
            logits = o.logits[:, -1].double().numpy()
            if vocab_mask is not None:
                logits = np.where(vocab_mask.astype(bool), logits, -np.inf)
            nxt = []
            for b in range(b_sz):
                lb = logits[b].copy()
                for tok in seen[b]:
                    lb[tok] = lb[tok] / rep_pen if lb[tok] > 0 \
                        else lb[tok] * rep_pen
                if t < min_len:  # HF cur_len convention
                    lb[eos] = -np.inf
                tok = int(lb.argmax())
                if done[b]:
                    tok = pad
                else:
                    if tok == eos:
                        done[b] = True
                    out[b, t] = tok
                    seen[b].add(tok)
                nxt.append(tok)
            if all(done):
                break
            cur = torch.tensor(nxt, dtype=torch.long)[:, None]
    return out


def test_greedy_search_matches_torch_loop():
    torch.manual_seed(60)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 4), dtype=torch.int32)
    max_len, rep_pen = 10, 1.3

    # pick EOS = the token the free-running reference emits at step 2 for
    # row 0, so the engine must early-stop that row and pad behind it
    free = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=-1, pad=-1)
    eos = int(free[0, 6])
    pad = 49
    want = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=eos, pad=pad)
    assert (want[0] == pad).any()  # early stop actually happened

    model = import_onnx(_greedy_model(
        _export_step_graph(m), eos=eos, pad=pad
    ))
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([1], np.int32), np.array([rep_pen], np.float32),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)


def test_greedy_search_min_length_and_vocab_mask():
    torch.manual_seed(61)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len, rep_pen = 9, 1.0

    free = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=-1, pad=-1)
    eos = int(free[1, 4])  # row 1 would emit this early...
    pad = 0
    min_len = 8  # ...but min_length suppresses EOS until length 8
    vocab_mask = np.ones(50, np.int32)
    vocab_mask[int(free[0, 3])] = 0  # ban row 0's would-be first token

    want = _torch_greedy(m, prompt, max_len=max_len, min_len=min_len,
                         rep_pen=rep_pen, eos=eos, pad=pad,
                         vocab_mask=vocab_mask)

    model = import_onnx(_greedy_model(
        _export_step_graph(m), eos=eos, pad=pad, with_vocab_mask=True
    ))
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([min_len], np.int32), np.array([rep_pen], np.float32),
        vocab_mask,
    )
    np.testing.assert_array_equal(np.asarray(seq), want)


# ---------------------------------------------------------------------------
# com.microsoft BeamSearch — the default node convert_generation.py emits.
# Oracle: HF generate() itself (the static-shape beam search the op
# ports), token-for-token AND score parity.
# ---------------------------------------------------------------------------


def _beam_model(decoder_graph, *, eos, pad, early_stopping=0, b_sz=2,
                n_scores=True):
    inputs = ["input_ids", "max_length", "min_length", "num_beams",
              "num_return_sequences", "length_penalty",
              "repetition_penalty"]
    outputs = ["sequences"] + (["sequences_scores"] if n_scores else [])
    node = P.make_node(
        "BeamSearch", inputs, outputs, domain=MS,
        decoder=decoder_graph, eos_token_id=eos, pad_token_id=pad,
        model_type=0, early_stopping=early_stopping,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [b_sz, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("num_beams", I32, [1]),
        P.make_value_info("num_return_sequences", I32, [1]),
        P.make_value_info("length_penalty", F, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
    ]
    out_vis = [P.make_value_info("sequences", I32, [b_sz, "ret", "len"])]
    if n_scores:
        out_vis.append(P.make_value_info("sequences_scores", F, [b_sz, "ret"]))
    graph = P.GraphProto(
        name="gpt2_beam", node=[node], input=vis, output=out_vis,
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def _hf_beam(m, prompt, *, max_len, num_beams, num_return, length_penalty,
             repetition_penalty, eos, pad, early_stopping, min_len=0):
    kw = dict(
        max_length=max_len, num_beams=num_beams,
        num_return_sequences=num_return, do_sample=False,
        length_penalty=length_penalty, early_stopping=early_stopping,
        pad_token_id=pad, return_dict_in_generate=True, output_scores=True,
    )
    if repetition_penalty != 1.0:
        kw["repetition_penalty"] = repetition_penalty
    if min_len:
        kw["min_length"] = min_len
    kw["eos_token_id"] = eos if eos >= 0 else None
    with torch.no_grad():
        # explicit all-ones mask: generate() would otherwise infer one
        # from pad_token_id hits inside the (random) prompt
        out = m.generate(
            prompt.long(),
            attention_mask=torch.ones_like(prompt, dtype=torch.long),
            **kw,
        )
    b_sz = prompt.shape[0]
    seqs = np.full((b_sz * num_return, max_len), pad, np.int32)
    got = out.sequences.numpy()
    seqs[:, :got.shape[1]] = got
    return (
        seqs.reshape(b_sz, num_return, max_len),
        out.sequences_scores.numpy().reshape(b_sz, num_return),
    )


def _run_beam(model_proto, prompt, *, max_len, num_beams, num_return,
              length_penalty, repetition_penalty, min_len=1):
    model = import_onnx(model_proto)
    fwd = make_forward(model, precision="fp32")
    return fwd(
        model.params, np.asarray(prompt),
        np.array([max_len], np.int32), np.array([min_len], np.int32),
        np.array([num_beams], np.int32), np.array([num_return], np.int32),
        np.array([length_penalty], np.float32),
        np.array([repetition_penalty], np.float32),
    )


def test_beam_search_matches_hf_generate():
    """No EOS (pure length-bounded beams): sequences and length-penalized
    scores match HF generate exactly."""
    torch.manual_seed(62)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len, k, r, lp, rp = 9, 3, 2, 1.0, 1.0

    want_seq, want_scores = _hf_beam(
        m, prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp, eos=-1, pad=49,
        early_stopping=False,
    )
    seq, scores = _run_beam(
        _beam_model(_export_step_graph(m), eos=51, pad=49),
        prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp,
    )
    np.testing.assert_array_equal(np.asarray(seq), want_seq)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


def test_beam_search_eos_early_stopping_and_penalties():
    """EOS absorption + early_stopping=True + length/repetition penalties:
    token-for-token vs HF generate."""
    torch.manual_seed(63)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 4), dtype=torch.int32)
    max_len, k, r, lp, rp = 12, 4, 3, 2.0, 1.2

    # EOS chosen (from a free-run sweep) so several beams genuinely
    # absorb it under these penalties — exercising hypothesis storage,
    # the early-stop heuristic, and the finished-beam merge
    eos = 26
    pad = 49
    want_seq, want_scores = _hf_beam(
        m, prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp, eos=eos, pad=pad,
        early_stopping=True,
    )
    assert (want_seq == eos).any()  # absorption actually happened

    seq, scores = _run_beam(
        _beam_model(_export_step_graph(m), eos=eos, pad=pad,
                    early_stopping=1),
        prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp,
    )
    np.testing.assert_array_equal(np.asarray(seq), want_seq)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


# ---------------------------------------------------------------------------
# WhisperBeamSearch / BeamSearch model_type=2 — the encoder-decoder
# generation artifact ORT's whisper export script emits. Oracle: HF
# generate on the same tiny Whisper.
# ---------------------------------------------------------------------------


def _tiny_whisper():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=100, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
        max_source_positions=25, max_target_positions=32,
        attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    return WhisperForConditionalGeneration(cfg)


class _WhisperEncDecInit(torch.nn.Module):
    """convert_generation's encoder_decoder_init: encoder + decoder
    prefill in one graph — logits, then present self/cross caches."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, feats, dec_ids):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        enc = self.m.model.encoder(feats).last_hidden_state
        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        out = self.m.model.decoder(
            input_ids=dec_ids.long(), encoder_hidden_states=enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        ca = out.past_key_values.cross_attention_cache
        outs = [logits]
        for i in range(2):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        for i in range(2):
            outs += [ca.layers[i].keys, ca.layers[i].values]
        return tuple(outs)


class _WhisperBeamStep(torch.nn.Module):
    """convert_generation's decoder: with-past step, cross caches static
    (reused via is_updated), self caches grow; no mask/position inputs."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, sk0, sv0, sk1, sv1, ck0, cv0, ck1, cv1):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        sa, ca = DynamicCache(), DynamicCache()
        sa.update(sk0, sv0, 0)
        sa.update(sk1, sv1, 1)
        ca.update(ck0, cv0, 0)
        ca.update(ck1, cv1, 1)
        cache = EncoderDecoderCache(sa, ca)
        # enc hidden states are never read: cross caches are reused
        dummy_enc = torch.zeros(ids.shape[0], 1, 32)
        out = self.m.model.decoder(
            input_ids=ids.long(), encoder_hidden_states=dummy_enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        outs = [logits]
        for i in range(2):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        return tuple(outs)


def _export_whisper_graphs(m):
    feats = torch.randn(1, 8, 50) * 0.5
    dec_ids = torch.tensor([[1, 5]], dtype=torch.int32)
    self_names = [f"present_{c}_self_{i}" for i in range(2)
                  for c in ("key", "value")]
    cross_names = [f"present_{c}_cross_{i}" for i in range(2)
                   for c in ("key", "value")]
    enc_dyn = {"encoder_input_features": {0: "batch"},
               "decoder_input_ids": {0: "batch", 1: "seq"}}
    enc_graph = P.decode_model(export_onnx_bytes(
        _WhisperEncDecInit(m), (feats, dec_ids), opset_version=17,
        input_names=["encoder_input_features", "decoder_input_ids"],
        output_names=["logits"] + self_names + cross_names,
        dynamic_axes=enc_dyn,
    )).graph

    sk = [torch.randn(1, 2, 2, 16) for _ in range(4)]
    ck = [torch.randn(1, 2, 25, 16) for _ in range(4)]
    past_self = [f"past_{c}_self_{i}" for i in range(2)
                 for c in ("key", "value")]
    past_cross = [f"past_{c}_cross_{i}" for i in range(2)
                  for c in ("key", "value")]
    dec_dyn = {"input_ids": {0: "batch"}}
    dec_dyn.update({n: {0: "batch", 2: "past"} for n in past_self})
    dec_dyn.update({n: {0: "batch"} for n in past_cross})
    dec_graph = P.decode_model(export_onnx_bytes(
        _WhisperBeamStep(m),
        (torch.tensor([[7]], dtype=torch.int32), *sk, *ck),
        opset_version=17,
        input_names=["input_ids"] + past_self + past_cross,
        output_names=["logits"] + self_names,
        dynamic_axes=dec_dyn,
    )).graph
    return enc_graph, dec_graph


def _whisper_beam_model(enc_graph, dec_graph, *, eos, pad, early_stopping):
    inputs = ["input_features", "max_length", "min_length", "num_beams",
              "num_return_sequences", "length_penalty",
              "repetition_penalty", "", "", "", "decoder_input_ids"]
    node = P.make_node(
        "WhisperBeamSearch", inputs, ["sequences", "sequences_scores"],
        domain=MS, encoder=enc_graph, decoder=dec_graph,
        eos_token_id=eos, pad_token_id=pad, model_type=2,
        early_stopping=early_stopping, decoder_start_token_id=1,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_features", F, [1, 8, 50]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("num_beams", I32, [1]),
        P.make_value_info("num_return_sequences", I32, [1]),
        P.make_value_info("length_penalty", F, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
        P.make_value_info("decoder_input_ids", I32, [1, "seq"]),
    ]
    graph = P.GraphProto(
        name="whisper_beam", node=[node], input=vis,
        output=[P.make_value_info("sequences", I32, [1, "ret", "len"]),
                P.make_value_info("sequences_scores", F, [1, "ret"])],
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def test_whisper_beam_search_matches_hf_generate():
    torch.manual_seed(64)
    m = _tiny_whisper()
    m.eval()
    feats = torch.randn(1, 8, 50) * 0.5
    prompt = torch.tensor([[1, 5, 9]], dtype=torch.int32)
    max_len, k, r, lp = 10, 3, 2, 1.0

    kw = dict(
        max_length=max_len, num_beams=k, num_return_sequences=r,
        do_sample=False, length_penalty=lp, early_stopping=False,
        pad_token_id=0, eos_token_id=2, return_dict_in_generate=True,
        output_scores=True,
    )
    from transformers.generation import GenerationMixin

    with torch.no_grad():
        # the base beam search, not WhisperForConditionalGeneration's
        # long-form override (which assumes real task/language tokens)
        out = GenerationMixin.generate(
            m, feats, decoder_input_ids=prompt.long(), **kw
        )
    want = np.full((1 * r, max_len), 0, np.int32)
    got = out.sequences.numpy()
    want[:, :got.shape[1]] = got
    want = want.reshape(1, r, max_len)
    want_scores = out.sequences_scores.numpy().reshape(1, r)

    enc_graph, dec_graph = _export_whisper_graphs(m)
    model = import_onnx(_whisper_beam_model(
        enc_graph, dec_graph, eos=2, pad=0, early_stopping=0
    ))
    fwd = make_forward(model, precision="fp32")
    seq, scores = fwd(
        model.params, np.asarray(feats),
        np.array([max_len], np.int32), np.array([1], np.int32),
        np.array([k], np.int32), np.array([r], np.int32),
        np.array([lp], np.float32), np.array([1.0], np.float32),
        np.asarray(prompt),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


def test_whisper_beam_one_equals_greedy():
    """BeamSearch num_beams=1 (how convert_generation exports
    encoder-decoder greedy decoding) reproduces HF's greedy path."""
    torch.manual_seed(65)
    m = _tiny_whisper()
    m.eval()
    feats = torch.randn(1, 8, 50) * 0.5
    prompt = torch.tensor([[1, 4]], dtype=torch.int32)
    max_len = 8

    from transformers.generation import GenerationMixin

    with torch.no_grad():
        out = GenerationMixin.generate(
            m, feats, decoder_input_ids=prompt.long(), max_length=max_len,
            num_beams=1, do_sample=False, pad_token_id=0, eos_token_id=2,
        )
    want = np.full((1, 1, max_len), 0, np.int32)
    want[0, 0, :out.shape[1]] = out.numpy()

    enc_graph, dec_graph = _export_whisper_graphs(m)
    model = import_onnx(_whisper_beam_model(
        enc_graph, dec_graph, eos=2, pad=0, early_stopping=0
    ))
    fwd = make_forward(model, precision="fp32")
    seq, _ = fwd(
        model.params, np.asarray(feats),
        np.array([max_len], np.int32), np.array([1], np.int32),
        np.array([1], np.int32), np.array([1], np.int32),
        np.array([1.0], np.float32), np.array([1.0], np.float32),
        np.asarray(prompt),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)


# ---------------------------------------------------------------------------
# com.microsoft Sampling — the third convert_generation op: the greedy
# loop with temperature + top-p nucleus sampling. RNG is the engine's
# documented jax-PRNG convention, so the oracle mirrors the exact key
# schedule against torch logits.
# ---------------------------------------------------------------------------


def _sampling_model(decoder_graph, *, eos, pad, temperature, top_p, seed):
    node = P.make_node(
        "Sampling",
        ["input_ids", "max_length", "min_length", "repetition_penalty"],
        ["sequences"], domain=MS,
        decoder=decoder_graph, eos_token_id=eos, pad_token_id=pad,
        model_type=0, temperature=temperature, top_p=top_p, seed=seed,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [2, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
    ]
    graph = P.GraphProto(
        name="gpt2_sampling", node=[node], input=vis,
        output=[P.make_value_info("sequences", I32, [2, "max_length"])],
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def _run_sampling(model_proto, prompt, max_len):
    model = import_onnx(model_proto)
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([1], np.int32), np.array([1.0], np.float32),
    )
    return np.asarray(seq)


def test_sampling_top_p_degenerates_to_greedy():
    """top_p -> 0 keeps only the most probable token: sampling must
    reproduce the greedy trajectory exactly regardless of seed."""
    torch.manual_seed(66)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len = 8
    want = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=1.0, eos=-1, pad=-1)
    step = _export_step_graph(m)
    for seed in (0, 7):
        seq = _run_sampling(
            _sampling_model(step, eos=51, pad=49, temperature=1.0,
                            top_p=1e-6, seed=seed),
            prompt, max_len,
        )
        np.testing.assert_array_equal(seq, want)


def test_sampling_matches_mirrored_rng_oracle():
    """temperature + top-p sampling matches an independent torch-logits
    loop that mirrors the documented key schedule
    (fold_in(PRNGKey(seed), t) + categorical)."""
    import jax
    import jax.numpy as jnp

    torch.manual_seed(67)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len, temperature, top_p, seed = 9, 0.8, 0.9, 13
    eos, pad = 51, 49  # no EOS in vocab: full-length trajectories

    from transformers.cache_utils import DynamicCache

    b_sz, s0 = prompt.shape
    want = np.full((b_sz, max_len), pad, np.int32)
    want[:, :s0] = prompt.numpy()
    base_key = jax.random.PRNGKey(seed)
    cache = DynamicCache()
    cur = prompt
    with torch.no_grad():
        for t in range(s0, max_len):
            o = m(input_ids=cur.long(), past_key_values=cache,
                  use_cache=True)
            cache = o.past_key_values
            logits = o.logits[:, -1].float().numpy() / temperature
            # mirror the engine's nucleus filter
            order = np.argsort(-logits, axis=-1)
            srt = np.take_along_axis(logits, order, axis=-1)
            probs = np.exp(srt - srt.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            cum = np.cumsum(probs, axis=-1)
            remove = (cum - probs) > top_p
            remove[:, :1] = False
            kth = (~remove).sum(-1) - 1
            thr = np.take_along_axis(srt, kth[:, None], axis=-1)
            filtered = np.where(logits >= thr, logits, -np.inf)
            key = jax.random.fold_in(base_key, t)
            nxt = np.asarray(jax.random.categorical(
                key, jnp.asarray(filtered), axis=-1
            )).astype(np.int32)
            want[:, t] = nxt
            cur = torch.from_numpy(nxt.astype(np.int64))[:, None]

    seq = _run_sampling(
        _sampling_model(_export_step_graph(m), eos=eos, pad=pad,
                        temperature=temperature, top_p=top_p, seed=seed),
        prompt, max_len,
    )
    np.testing.assert_array_equal(seq, want)


# ---------------------------------------------------------------------------
# Typed-rejection coverage: malformed or out-of-scope generation nodes
# must fail with NotImplementedError/ValueError naming the feature, never
# raw TypeError / IndexError / KeyError.
# ---------------------------------------------------------------------------


def test_generation_typed_rejections():
    torch.manual_seed(68)
    m = _tiny_whisper()
    m.eval()
    enc_graph, dec_graph = _export_whisper_graphs(m)
    feats = np.zeros((1, 8, 50), np.float32)
    prompt = np.array([[1, 5]], np.int32)
    args = (
        feats, np.array([8], np.int32), np.array([1], np.int32),
        np.array([2], np.int32), np.array([1], np.int32),
        np.array([1.0], np.float32), np.array([1.0], np.float32),
    )

    def build(**node_kw):
        inputs = node_kw.pop("inputs", [
            "input_features", "max_length", "min_length", "num_beams",
            "num_return_sequences", "length_penalty",
            "repetition_penalty", "", "", "", "decoder_input_ids",
        ])
        outputs = node_kw.pop("outputs", ["sequences"])
        node = P.make_node(
            "WhisperBeamSearch", inputs, outputs, domain=MS,
            encoder=node_kw.pop("encoder", enc_graph),
            decoder=node_kw.pop("decoder", dec_graph),
            eos_token_id=2, pad_token_id=0, model_type=2,
            **node_kw,
        )
        I32, F = P.DataType.INT32, P.DataType.FLOAT
        vis = [
            P.make_value_info("input_features", F, [1, 8, 50]),
            P.make_value_info("max_length", I32, [1]),
            P.make_value_info("min_length", I32, [1]),
            P.make_value_info("num_beams", I32, [1]),
            P.make_value_info("num_return_sequences", I32, [1]),
            P.make_value_info("length_penalty", F, [1]),
            P.make_value_info("repetition_penalty", F, [1]),
            P.make_value_info("decoder_input_ids", I32, [1, "seq"]),
        ]
        extra_vis = node_kw_extra.get("vis", [])
        graph = P.GraphProto(
            name="g", node=[node], input=vis + extra_vis,
            output=[P.make_value_info(o, I32, []) for o in outputs],
        )
        return P.ModelProto(
            ir_version=8, graph=graph,
            opset_import=[P.OperatorSetId(domain="", version=17),
                          P.OperatorSetId(domain=MS, version=1)],
        )

    node_kw_extra = {}

    # 1. unknown logits_processor value (1 = timestamp rules is
    # supported; anything else is not)
    node_kw_extra["vis"] = [
        P.make_value_info("lp", P.DataType.INT32, [1])
    ]
    mdl = build(inputs=[
        "input_features", "max_length", "min_length", "num_beams",
        "num_return_sequences", "length_penalty", "repetition_penalty",
        "", "", "", "decoder_input_ids", "lp",
    ])
    fwd = make_forward(import_onnx(mdl), precision="fp32")
    with pytest.raises(NotImplementedError, match="logits_processor"):
        fwd(import_onnx(mdl).params, *args, prompt, np.array([2], np.int32))

    # 2. extra inputs beyond logits_processor (cross_qk_layer_head etc.)
    node_kw_extra["vis"] = [
        P.make_value_info("lp", P.DataType.INT32, [1]),
        P.make_value_info("cq", P.DataType.INT32, [1, 2]),
    ]
    mdl = build(inputs=[
        "input_features", "max_length", "min_length", "num_beams",
        "num_return_sequences", "length_penalty", "repetition_penalty",
        "", "", "", "decoder_input_ids", "", "cq",
    ])
    fwd = make_forward(import_onnx(mdl), precision="fp32")
    with pytest.raises(NotImplementedError, match="cross_qk_layer_head"):
        fwd(import_onnx(mdl).params, *args, prompt,
            np.array([0], np.int32), np.zeros((1, 2), np.int32))

    # 3. third output (cross_qk)
    node_kw_extra["vis"] = []
    mdl = build(outputs=["sequences", "sequences_scores", "cross_qk"])
    fwd = make_forward(import_onnx(mdl), precision="fp32")
    with pytest.raises(NotImplementedError, match="outputs beyond"):
        fwd(import_onnx(mdl).params, *args, prompt)

    # 4. T5-style mask-carrying encoder layout
    import copy

    t5_enc = copy.deepcopy(enc_graph)
    t5_enc.input[1].name = "encoder_attention_mask"
    mdl = build(encoder=t5_enc)
    fwd = make_forward(import_onnx(mdl), precision="fp32")
    with pytest.raises(NotImplementedError, match="whisper form"):
        fwd(import_onnx(mdl).params, *args, prompt)


def test_greedy_pastless_decoder_rejected():
    """A decoder subgraph without past inputs is a typed error, not an
    IndexError."""
    nodes = [P.make_node("Identity", ["input_ids"], ["logits"])]
    g = P.GraphProto(
        name="no_past", node=nodes, input=[
            P.make_value_info("input_ids", P.DataType.INT32, [1, "s"]),
            P.make_value_info("position_ids", P.DataType.INT32, [1, "s"]),
            P.make_value_info("attention_mask", P.DataType.INT32, [1, "s"]),
        ],
        output=[P.make_value_info("logits", P.DataType.FLOAT, [1, "s", 5])],
    )
    mdl = _greedy_model(g, eos=4, pad=0)
    fwd = make_forward(import_onnx(mdl), precision="fp32")
    with pytest.raises(NotImplementedError, match="no past inputs"):
        fwd(import_onnx(mdl).params, np.array([[1, 2]], np.int32),
            np.array([5], np.int32), np.array([1], np.int32),
            np.array([1.0], np.float32))


def test_greedy_search_checkpoint_roundtrip(tmp_path):
    """The GreedySearch node's decoder graph attribute survives a .btck
    round-trip; sequences identical before/after."""
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    torch.manual_seed(60)
    m = _tiny_gpt2()
    m.eval()
    orig = import_onnx(_greedy_model(_export_step_graph(m), eos=51, pad=49))
    ck = tmp_path / "greedy.btck"
    save_checkpoint(orig, ck)
    back = load_checkpoint(ck)
    prompt = np.array([[3, 7, 11, 2], [9, 1, 4, 40]], np.int32)
    args = (prompt, np.array([8], np.int32), np.array([1], np.int32),
            np.array([1.1], np.float32))
    a = make_forward(orig, precision="fp32")(orig.params, *args)[0]
    b = make_forward(back, precision="fp32")(back.params, *args)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_whisper_beam_search_batched():
    """B=2 distinct recordings through the encoder-decoder branch:
    per-batch freezing and beam bookkeeping must match HF generate."""
    torch.manual_seed(69)
    m = _tiny_whisper()
    m.eval()
    feats = torch.randn(2, 8, 50) * 0.5
    prompt = torch.tensor([[1, 6, 3], [1, 6, 3]], dtype=torch.int32)
    max_len, k, r, lp = 9, 3, 2, 1.2

    from transformers.generation import GenerationMixin

    with torch.no_grad():
        out = GenerationMixin.generate(
            m, feats, decoder_input_ids=prompt.long(), max_length=max_len,
            num_beams=k, num_return_sequences=r, do_sample=False,
            length_penalty=lp, early_stopping=False, pad_token_id=0,
            eos_token_id=2, return_dict_in_generate=True,
            output_scores=True,
        )
    want = np.full((2 * r, max_len), 0, np.int32)
    got = out.sequences.numpy()
    want[:, :got.shape[1]] = got
    want = want.reshape(2, r, max_len)
    want_scores = out.sequences_scores.numpy().reshape(2, r)

    enc_graph, dec_graph = _export_whisper_graphs(m)
    mdl = _whisper_beam_model(enc_graph, dec_graph, eos=2, pad=0,
                              early_stopping=0)
    # widen the declared batch dim to 2
    mdl.graph.input[0].type.tensor_type.shape.dim[0].dim_value = 2
    model = import_onnx(mdl)
    fwd = make_forward(model, precision="fp32")
    seq, scores = fwd(
        model.params, np.asarray(feats),
        np.array([max_len], np.int32), np.array([1], np.int32),
        np.array([k], np.int32), np.array([r], np.int32),
        np.array([lp], np.float32), np.array([1.0], np.float32),
        np.asarray(prompt),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


def test_sampling_presence_penalty():
    """presence_mask * presence_penalty subtracts from the scaled logits:
    a huge penalty on every token the prompt contains forces the sampler
    off those tokens entirely (and the mirrored oracle agrees)."""
    torch.manual_seed(70)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len = 8
    presence = np.zeros((2, 50), np.int32)
    for b in range(2):
        presence[b, prompt[b].numpy()] = 1

    node = P.make_node(
        "Sampling",
        ["input_ids", "max_length", "min_length", "repetition_penalty",
         "", "", "", "presence_mask"],
        ["sequences"], domain=MS,
        decoder=_export_step_graph(m), eos_token_id=51, pad_token_id=49,
        model_type=0, temperature=1.0, top_p=1.0, seed=3,
        presence_penalty=1e6,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [2, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
        P.make_value_info("presence_mask", I32, [2, 50]),
    ]
    mdl = P.ModelProto(
        ir_version=8, graph=P.GraphProto(
            name="g", node=[node], input=vis,
            output=[P.make_value_info("sequences", I32, [2, "max_length"])],
        ),
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )
    model = import_onnx(mdl)
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([1], np.int32), np.array([1.0], np.float32), presence,
    )
    seq = np.asarray(seq)
    for b in range(2):
        banned = set(prompt[b].tolist())
        assert not banned & set(seq[b, 3:].tolist())


def test_whisper_beam_search_timestamp_rules():
    """logits_processor=1 applies the whisper timestamp rules; oracle is
    HF generate with its own WhisperTimeStampLogitsProcessor configured
    to the node's id layout (notimestamps=108, timestamps 109.., initial
    cap 5)."""
    from transformers import (GenerationConfig, WhisperConfig,
                              WhisperForConditionalGeneration)
    from transformers.generation import GenerationMixin
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    torch.manual_seed(71)
    cfg = WhisperConfig(
        vocab_size=150, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
        max_source_positions=25, max_target_positions=32,
        attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    m = WhisperForConditionalGeneration(cfg)
    m.eval()
    feats = torch.randn(1, 8, 50) * 0.5
    prompt = torch.tensor([[1, 5]], dtype=torch.int32)
    max_len, k, r, no_ts = 10, 3, 2, 108

    gcfg = GenerationConfig(
        no_timestamps_token_id=no_ts, eos_token_id=2,
        max_initial_timestamp_index=5,
    )
    proc = WhisperTimeStampLogitsProcessor(gcfg, begin_index=2)
    with torch.no_grad():
        out = GenerationMixin.generate(
            m, feats, decoder_input_ids=prompt.long(), max_length=max_len,
            num_beams=k, num_return_sequences=r, do_sample=False,
            length_penalty=1.0, early_stopping=False, pad_token_id=0,
            eos_token_id=2, logits_processor=[proc],
            return_dict_in_generate=True, output_scores=True,
        )
    want = np.full((1 * r, max_len), 0, np.int32)
    got = out.sequences.numpy()
    want[:, :got.shape[1]] = got
    want = want.reshape(1, r, max_len)
    want_scores = out.sequences_scores.numpy().reshape(1, r)
    # the rules actually bit: the first generated token is a timestamp
    # inside the initial cap
    assert 109 <= want[0, 0, 2] <= 114

    enc_graph, dec_graph = _export_whisper_graphs(m)
    mdl = _whisper_beam_model(enc_graph, dec_graph, eos=2, pad=0,
                              early_stopping=0)
    # add the logits_processor input + timestamp attrs to the node
    node = mdl.graph.node[0]
    ins = list(node.input)
    while len(ins) < 10:
        ins.append("")
    node.input = ins[:10] + ["decoder_input_ids", "lp_flag"]
    node.attribute.append(P.make_attr("no_timestamps_token_id", no_ts))
    node.attribute.append(P.make_attr("max_initial_timestamp_index", 5))
    mdl.graph.input.append(
        P.make_value_info("lp_flag", P.DataType.INT32, [1])
    )
    model = import_onnx(mdl)
    fwd = make_forward(model, precision="fp32")
    seq, scores = fwd(
        model.params, np.asarray(feats),
        np.array([max_len], np.int32), np.array([1], np.int32),
        np.array([k], np.int32), np.array([r], np.int32),
        np.array([1.0], np.float32), np.array([1.0], np.float32),
        np.asarray(prompt), np.array([1], np.int32),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


# ---------------------------------------------------------------------------
# BeamSearch model_type=1 — the T5 subgraph layout (encoder_attention_mask
# threaded through both subgraphs). Oracle: HF generate on a tiny T5.
# ---------------------------------------------------------------------------


def _tiny_t5():
    from transformers import T5Config, T5ForConditionalGeneration

    cfg = T5Config(
        vocab_size=80, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1,
    )
    return T5ForConditionalGeneration(cfg)


class _T5EncDecInit(torch.nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, enc_ids, enc_mask, dec_ids):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        enc = self.m.encoder(
            input_ids=enc_ids.long(), attention_mask=enc_mask.long()
        ).last_hidden_state
        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        out = self.m.decoder(
            input_ids=dec_ids.long(), encoder_hidden_states=enc,
            encoder_attention_mask=enc_mask.long(),
            past_key_values=cache, use_cache=True,
        )
        seq = out.last_hidden_state
        if self.m.config.tie_word_embeddings:
            seq = seq * (self.m.model_dim ** -0.5)
        logits = self.m.lm_head(seq)
        sa = out.past_key_values.self_attention_cache
        ca = out.past_key_values.cross_attention_cache
        outs = [logits]
        for i in range(2):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        for i in range(2):
            outs += [ca.layers[i].keys, ca.layers[i].values]
        return tuple(outs)


class _T5BeamStep(torch.nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, enc_mask, sk0, sv0, sk1, sv1, ck0, cv0, ck1, cv1):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        sa, ca = DynamicCache(), DynamicCache()
        sa.update(sk0, sv0, 0)
        sa.update(sk1, sv1, 1)
        ca.update(ck0, cv0, 0)
        ca.update(ck1, cv1, 1)
        cache = EncoderDecoderCache(sa, ca)
        dummy_enc = torch.zeros(ids.shape[0], enc_mask.shape[1], 32)
        out = self.m.decoder(
            input_ids=ids.long(), encoder_hidden_states=dummy_enc,
            encoder_attention_mask=enc_mask.long(),
            past_key_values=cache, use_cache=True,
        )
        seq = out.last_hidden_state
        if self.m.config.tie_word_embeddings:
            seq = seq * (self.m.model_dim ** -0.5)
        logits = self.m.lm_head(seq)
        sa = out.past_key_values.self_attention_cache
        outs = [logits]
        for i in range(2):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        return tuple(outs)


def test_t5_beam_search_matches_hf_generate():
    torch.manual_seed(72)
    m = _tiny_t5()
    m.eval()
    enc_ids = torch.randint(2, 80, (1, 7), dtype=torch.int32)
    prompt = torch.tensor([[0, 9]], dtype=torch.int32)
    max_len, k, r, lp = 9, 3, 2, 1.0

    with torch.no_grad():
        out = m.generate(
            enc_ids.long(),
            attention_mask=torch.ones_like(enc_ids, dtype=torch.long),
            decoder_input_ids=prompt.long(), max_length=max_len,
            num_beams=k, num_return_sequences=r, do_sample=False,
            length_penalty=lp, early_stopping=False, pad_token_id=0,
            eos_token_id=1, return_dict_in_generate=True,
            output_scores=True,
        )
    want = np.full((1 * r, max_len), 0, np.int32)
    got = out.sequences.numpy()
    want[:, :got.shape[1]] = got
    want = want.reshape(1, r, max_len)
    want_scores = out.sequences_scores.numpy().reshape(1, r)

    self_names = [f"present_{c}_self_{i}" for i in range(2)
                  for c in ("key", "value")]
    cross_names = [f"present_{c}_cross_{i}" for i in range(2)
                   for c in ("key", "value")]
    enc_graph = P.decode_model(export_onnx_bytes(
        _T5EncDecInit(m),
        (enc_ids, torch.ones_like(enc_ids), prompt), opset_version=17,
        input_names=["encoder_input_ids", "encoder_attention_mask",
                     "decoder_input_ids"],
        output_names=["logits"] + self_names + cross_names,
        dynamic_axes={"encoder_input_ids": {0: "batch", 1: "enc"},
                      "encoder_attention_mask": {0: "batch", 1: "enc"},
                      "decoder_input_ids": {0: "batch", 1: "seq"}},
    )).graph

    sk = [torch.randn(1, 4, 2, 8) for _ in range(4)]
    ck = [torch.randn(1, 4, 7, 8) for _ in range(4)]
    past_self = [f"past_{c}_self_{i}" for i in range(2)
                 for c in ("key", "value")]
    past_cross = [f"past_{c}_cross_{i}" for i in range(2)
                  for c in ("key", "value")]
    dec_dyn = {"input_ids": {0: "batch"},
               "encoder_attention_mask": {0: "batch", 1: "enc"}}
    dec_dyn.update({n: {0: "batch", 2: "past"} for n in past_self})
    dec_dyn.update({n: {0: "batch", 2: "enc"} for n in past_cross})
    dec_graph = P.decode_model(export_onnx_bytes(
        _T5BeamStep(m),
        (torch.tensor([[3]], dtype=torch.int32),
         torch.ones_like(enc_ids), *sk, *ck),
        opset_version=17,
        input_names=["input_ids", "encoder_attention_mask"]
        + past_self + past_cross,
        output_names=["logits"] + self_names,
        dynamic_axes=dec_dyn,
    )).graph

    node = P.make_node(
        "BeamSearch",
        ["input_ids", "max_length", "min_length", "num_beams",
         "num_return_sequences", "length_penalty", "repetition_penalty",
         "", "", "", "decoder_input_ids"],
        ["sequences", "sequences_scores"], domain=MS,
        encoder=enc_graph, decoder=dec_graph,
        eos_token_id=1, pad_token_id=0, model_type=1, early_stopping=0,
        decoder_start_token_id=0,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [1, "enc"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("num_beams", I32, [1]),
        P.make_value_info("num_return_sequences", I32, [1]),
        P.make_value_info("length_penalty", F, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
        P.make_value_info("decoder_input_ids", I32, [1, "seq"]),
    ]
    mdl = P.ModelProto(
        ir_version=8, graph=P.GraphProto(
            name="t5_beam", node=[node], input=vis,
            output=[P.make_value_info("sequences", I32, [1, "ret", "len"]),
                    P.make_value_info("sequences_scores", F, [1, "ret"])],
        ),
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )
    model = import_onnx(mdl)
    fwd = make_forward(model, precision="fp32")
    seq, scores = fwd(
        model.params, np.asarray(enc_ids),
        np.array([max_len], np.int32), np.array([1], np.int32),
        np.array([k], np.int32), np.array([r], np.int32),
        np.array([lp], np.float32), np.array([1.0], np.float32),
        np.asarray(prompt),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)
