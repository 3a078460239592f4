"""Generates tests/fixtures/tiny_spiece.model — a small unigram
sentencepiece model in the real .model (ModelProto) wire format, built with
vlpet_tpu.data.spm.write_model. Deterministic; re-run to regenerate."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vlpet_tpu.data.spm import CONTROL, NORMAL, UNKNOWN, SpmModel, write_model

WS = "▁"

WORDS = ["the", "a", "cat", "sat", "on", "mat", "dog", "ran", "in", "park",
         "man", "is", "walk", "ing", "two", "people", "are", "picture",
         "what", "color", "of", "question", "answer", "true", "false",
         "yes", "no", "red", "blue", "green"]
SUBWORDS = ["ing", "ed", "s", "er", "at", "an", "ar", "al", "qu"]


def build() -> SpmModel:
    pieces = ["<pad>", "</s>", "<unk>"]
    scores = [0.0, 0.0, 0.0]
    types = [CONTROL, CONTROL, UNKNOWN]

    def add(piece, score):
        pieces.append(piece)
        scores.append(score)
        types.append(NORMAL)

    for i, w in enumerate(WORDS):
        add(WS + w, -2.0 - 0.01 * i)
    for i, s in enumerate(SUBWORDS):
        add(s, -4.0 - 0.01 * i)
    for i in range(26):
        add(chr(ord("a") + i), -8.0 - 0.01 * i)
    for i in range(10):
        add(str(i), -9.0 - 0.01 * i)
    add(WS, -7.5)
    for ch in ".,?!'\"-:":
        add(ch, -8.5)
    return SpmModel(pieces=pieces, scores=scores, types=types)


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "tiny_spiece.model")
    with open(out, "wb") as f:
        f.write(write_model(build()))
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")
