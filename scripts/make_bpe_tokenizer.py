#!/usr/bin/env python
"""Train a LLaMA-3-style byte-level BPE tokenizer locally (no egress needed).

The parity harness's word-level toy tokenizer cannot exercise the most
tokenizer-sensitive logic in the repo: `train/masking.py`'s round-length
arithmetic (per-round re-tokenizations must sum EXACTLY to the one-shot
tokenization of the full conversation — BPE merges across round boundaries
are precisely what could break this) and `multimodal/mm_utils.py`'s bos-dedup
splice. This script builds a REAL byte-level BPE with the same structure as
the LLaMA-3 tokenizer (reference dep: `tokenizers` Rust BPE via
`transformers.AutoTokenizer`, `/root/reference/pyproject.toml:15`,
`/root/reference/metamorph/train/train.py:1470-1476`):

  * GPT-4/LLaMA-3 split regex -> ByteLevel pre-tokenizer (any byte string
    tokenizes; merges can cross word-internal boundaries),
  * BPE merges trained on local text (repo docs + installed-package source
    + synthetic conversational text with unicode/emoji/contractions),
  * vocab padded with reserved tokens so the base size is EXACTLY 128256 and
    the LLaMA-3 special tokens sit at their real ids (128000
    <|begin_of_text|>, 128001 <|end_of_text|>, 128006/7 header ids, 128009
    <|eot_id|>) — `add_tokens([<image_start>, <image_end>])` then lands on
    128256/128257 exactly like the reference's resize
    (`metamorph_arch.py:427-446`),
  * a TemplateProcessing post-processor that prepends bos, matching HF
    LLaMA-3 `tokenizer(s).input_ids` behavior that the round arithmetic
    depends on (`train.py:563-570`).

    python scripts/make_bpe_tokenizer.py --out /tmp/parity/tokenizer_bpe
"""

import argparse
import glob
import os
import random

# LLaMA-3 / GPT-4 pre-tokenization split pattern (public tiktoken
# cl100k/o200k-family regex, as shipped in the LLaMA-3 tokenizer.json).
LLAMA3_SPLIT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

SPECIAL_IDS = {
    "<|begin_of_text|>": 128000,
    "<|end_of_text|>": 128001,
    "<|start_header_id|>": 128006,
    "<|end_header_id|>": 128007,
    "<|eot_id|>": 128009,
}

BASE_VOCAB = 128256


def corpus_iter(seed: int = 0, max_files: int = 400):
    """Local text: repo markdown/python + installed-package sources +
    synthetic conversational text stressing BPE edge cases."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "**", "*.md"), recursive=True))
    paths += sorted(glob.glob(os.path.join(repo, "metamorph_tpu", "**", "*.py"),
                              recursive=True))
    try:
        import transformers
        pkg = os.path.dirname(transformers.__file__)
        paths += sorted(glob.glob(os.path.join(pkg, "*.py")))[:120]
    except ImportError:
        pass
    for p in paths[:max_files]:
        try:
            with open(p, encoding="utf-8", errors="ignore") as f:
                yield f.read()
        except OSError:
            continue

    rng = random.Random(seed)
    words = ("the a an is are was what which how many describe color shape "
             "answer question image picture scene cat dog tree red blue "
             "don't it's we're I'll you've o'clock United States 3.14 1999 "
             "hello world naïve café jalapeño über résumé").split()
    emoji = ["😀", "🐍", "✨", "→", "—", "“", "”", "…", "中文", "日本語",
             "한국어", "Ωμέγα", "кириллица"]
    for _ in range(3000):
        n = rng.randint(4, 30)
        toks = [rng.choice(words) for _ in range(n)]
        if rng.random() < 0.3:
            toks.insert(rng.randrange(n), rng.choice(emoji))
        sep = rng.choice([" ", " ", " ", "", ", ", ".\n", "? ", "! "])
        yield sep.join(toks)


def build(out_dir: str, vocab_size: int = 8000, seed: int = 0):
    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers
    from tokenizers import processors, trainers
    from transformers import PreTrainedTokenizerFast

    pre = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_SPLIT), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])

    # phase 1: train the merges
    trainer_tok = Tokenizer(models.BPE())
    trainer_tok.pre_tokenizer = pre
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    trainer_tok.train_from_iterator(corpus_iter(seed), trainer)

    tmp = os.path.join(out_dir, "_bpe_model")
    os.makedirs(tmp, exist_ok=True)
    trainer_tok.model.save(tmp)
    import json
    with open(os.path.join(tmp, "vocab.json"), encoding="utf-8") as f:
        vocab = json.load(f)
    merges = []
    with open(os.path.join(tmp, "merges.txt"), encoding="utf-8") as f:
        for line in f:
            if line.startswith("#version"):
                continue
            a, _, b = line.rstrip("\n").partition(" ")
            if b:
                merges.append((a, b))

    # phase 2: pad to exactly 128256 base entries, specials at LLaMA-3 ids
    next_id = len(vocab)
    assert next_id <= 128000, "trained vocab exceeds the reserved-id floor"
    special_at = {v: k for k, v in SPECIAL_IDS.items()}
    i = 0
    while len(vocab) < BASE_VOCAB:
        tok_str = special_at.get(next_id, f"<|reserved_token_{i}|>")
        vocab[tok_str] = next_id
        next_id += 1
        i += 1

    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre
    tok.decoder = decoders.ByteLevel()
    # mark specials (reuses the vocab ids; never split by the pre-tokenizer)
    tok.add_special_tokens(sorted(SPECIAL_IDS))
    tok.post_processor = processors.TemplateProcessing(
        single="<|begin_of_text|> $A",
        pair="<|begin_of_text|> $A <|begin_of_text|> $B",
        special_tokens=[("<|begin_of_text|>", SPECIAL_IDS["<|begin_of_text|>"])],
    )

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>", eos_token="<|end_of_text|>",
        model_max_length=4096)
    os.makedirs(out_dir, exist_ok=True)
    fast.save_pretrained(out_dir)
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--vocab-size", type=int, default=8000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    build(args.out, args.vocab_size, args.seed)
    print(args.out)


if __name__ == "__main__":
    main()
