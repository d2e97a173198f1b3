"""Sequence packing for LLM training batches.

TTS corpora are dominated by short utterances (a few seconds of speech =
100-300 tokens), so the unpacked train step (one utterance per row, padded)
leaves most of each row idle.  The packer bins whole [sos, text, task,
speech, eos-label] examples into fixed-length rows with block-diagonal
attention (Qwen2LM.packed_call), raising tokens/step several-fold at the
same activation memory — the standard packing recipe the reference's
DDP/DeepSpeed loop (cosyvoice/utils/executor.py:35-82) never had.

Loss equivalence with the unpacked step is exact: packing changes neither
any example's target positions nor the masked-CE denominator
(tests/test_train.py::test_packed_llm_step_matches_unpacked).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

PAD, TEXT, SPECIAL, SPEECH = 0, 1, 2, 3


def pack_llm_examples(examples: Sequence[tuple], row_len: int,
                      sos_eos: int = 0, task_id: int = 1,
                      eos_token: Optional[int] = None,
                      ignore_id: int = -1,
                      n_rows: Optional[int] = None) -> dict:
    """Pack (text_ids, speech_ids) examples into fixed [n_rows, row_len]
    arrays for Qwen2LM.packed_call.

    Each example occupies 2 + len(text) + len(speech) positions
    ([sos, text, task, speech]); its targets are the speech tokens shifted
    by one plus a final EOS, IGNORE elsewhere — identical to the unpacked
    __call__'s construction.  Greedy first-fit-decreasing binning; examples
    longer than row_len raise.  Returns dict(ids, types, positions, seg,
    target) int32 arrays plus 'n_tokens' (total non-pad positions).
    """
    assert eos_token is not None, "pass cfg.eos_token"
    lens = [2 + len(t) + len(s) for t, s in examples]
    assert max(lens) <= row_len, (max(lens), row_len)
    order = np.argsort(lens)[::-1]
    rows: list = []           # list of (used, [example indices])
    for i in order:
        need = lens[i]
        for r in rows:
            if r[0] + need <= row_len:
                r[0] += need
                r[1].append(i)
                break
        else:
            rows.append([need, [i]])
    if n_rows is not None:
        assert len(rows) <= n_rows, (len(rows), n_rows)
        while len(rows) < n_rows:
            rows.append([0, []])
    B = len(rows)
    ids = np.zeros((B, row_len), np.int32)
    types = np.zeros((B, row_len), np.int32)
    positions = np.zeros((B, row_len), np.int32)
    seg = np.zeros((B, row_len), np.int32)
    target = np.full((B, row_len), ignore_id, np.int32)
    n_tokens = 0
    for b, (_, idxs) in enumerate(rows):
        at = 0
        for si, i in enumerate(idxs, start=1):
            t, s = examples[i]
            t = np.asarray(t, np.int32)
            s = np.asarray(s, np.int32)
            tl, sl = len(t), len(s)
            L = 2 + tl + sl
            sl_ = slice(at, at + L)
            ids[b, at] = sos_eos
            types[b, at] = SPECIAL
            ids[b, at + 1: at + 1 + tl] = t
            types[b, at + 1: at + 1 + tl] = TEXT
            ids[b, at + 1 + tl] = task_id
            types[b, at + 1 + tl] = SPECIAL
            ids[b, at + 2 + tl: at + L] = s
            types[b, at + 2 + tl: at + L] = SPEECH
            positions[b, sl_] = np.arange(L)
            seg[b, sl_] = si
            # position p predicts token p+1: speech targets start at the
            # task position, EOS at the last speech position
            target[b, at + 1 + tl: at + 1 + tl + sl] = s
            target[b, at + 1 + tl + sl] = eos_token
            at += L
            n_tokens += L
    return {"ids": ids, "types": types, "positions": positions, "seg": seg,
            "target": target, "n_tokens": n_tokens}


def packed_llm_loss_fn(model):
    """Loss closure over packed batches for train.step.make_train_step."""

    def loss_fn(params, batch, rng):
        out = model.apply(params, batch["ids"], batch["types"],
                          batch["positions"], batch["seg"], batch["target"],
                          method=type(model).packed_call)
        return out["loss"], {"acc": out["acc"]}

    return loss_fn
