"""Evaluator unit tests: normalization rules, known-value metric checks."""

import numpy as np
import pytest

from vlpet_tpu.evalsuite.vqa import VQAEvaluator, normalize_answer
from vlpet_tpu.evalsuite.gqa import GQAEvaluator
from vlpet_tpu.evalsuite.nlvr import NLVR2Evaluator
from vlpet_tpu.evalsuite.caption import (
    COCOCaptionEvaluator,
    cider_d,
    corpus_bleu,
    rouge_l,
)
from vlpet_tpu.evalsuite.video import TVQAEvaluator


class TestVQANormalization:
    def test_digit_and_article(self):
        assert normalize_answer("a two") == "2"
        assert normalize_answer("the dog") == "dog"

    def test_contractions(self):
        assert normalize_answer("dont") == "don't"

    def test_punctuation(self):
        assert normalize_answer("yes!") == "yes"

    def test_raw_accuracy_official_rule(self):
        """min(#matching/3, 1) averaged leave-one-out over 10 answers."""
        answers = [{"answer": "net"}] * 9 + [{"answer": "mesh"}]
        ev = VQAEvaluator(
            id2datum={1: {}},
            id2datum_gt={1: {"answers": answers, "question_type": "what",
                             "answer_type": "other"}})
        acc = ev.evaluate_raw({1: "net"})
        # 9 leave-one-out rounds see 8 or 9 matching -> acc 1; 1 round sees 9
        assert acc["overall"] == 100.0
        acc2 = ev.evaluate_raw({1: "mesh"})
        # each of 10 rounds: matching in others is 1 or 0 -> min(1/3,1)
        assert 0 < acc2["overall"] < 50

    def test_topk_evaluate(self):
        ev = VQAEvaluator(id2datum={1: {"label": {"yes": 0.9, "no": 0.3}}})
        assert ev.evaluate({1: "yes"}) == pytest.approx(0.9)
        assert ev.evaluate({1: "maybe"}) == 0.0


class TestNLVR:
    def test_accuracy_and_consistency(self):
        data = [
            {"identifier": "test1-100-0-0", "label": 1},
            {"identifier": "test1-100-1-0", "label": 0},
            {"identifier": "test1-200-0-0", "label": 1},
            {"identifier": "test1-200-1-0", "label": 1},
        ]
        id2uid = {d["identifier"]: i for i, d in enumerate(data)}
        ev = NLVR2Evaluator(data, id2uid)
        # all correct -> both consistency groups hold
        res = ev.evaluate({0: 1, 1: 0, 2: 1, 3: 1})
        assert res["accuracy"] == 100.0 and res["consistency"] == 100.0
        # one wrong in group 100 -> acc 75, consistency 50
        res = ev.evaluate({0: 1, 1: 1, 2: 1, 3: 1})
        assert res["accuracy"] == 75.0 and res["consistency"] == 50.0


class TestCaptionMetrics:
    def test_identity_gives_max_scores(self):
        cands = ["a man riding a horse on the beach",
                 "two dogs playing in the snow"]
        refs = [[c] for c in cands]
        bleu = corpus_bleu(cands, refs)
        assert all(abs(b - 1.0) < 1e-9 for b in bleu)
        assert rouge_l(cands, refs) == pytest.approx(1.0)
        assert cider_d(cands, refs) == pytest.approx(10.0, abs=1e-6)

    def test_disjoint_gives_zero(self):
        cands = ["aaa bbb ccc"]
        refs = [["xxx yyy zzz"]]
        assert cider_d(cands, refs) == pytest.approx(0.0, abs=1e-9)
        assert rouge_l(cands, refs) == 0.0

    def test_partial_overlap_ordering(self):
        # note: a 1-image corpus degenerates (idf = log(1) = 0); use 2 images
        refs = [["a man riding a horse on the beach"],
                ["two dogs playing in the snow"]]
        good = cider_d(["a man riding a horse on the beach at sunset",
                        "two dogs playing in the snow"], refs)
        bad = cider_d(["a cat", "two dogs playing in the snow"], refs)
        assert good > bad

    def test_evaluator_facade(self):
        ev = COCOCaptionEvaluator()
        res = ev.evaluate(
            ["a cat on a mat", "a bird in the sky"],
            [["a cat on a mat", "a cat sits on the mat"], ["a bird in the sky"]])
        assert set(res) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "METEOR", "CIDEr"}
        assert res["CIDEr"] > 5
        assert res["METEOR"] > 0.8  # near-identity captions


class TestMeteor:
    def test_identity_known_value(self):
        """Perfect match of 6 tokens: P=R=F=1, 1 chunk, m=6 →
        Pen = 0.5*(1/6)^3, score = 1 - 0.5/216 (Banerjee & Lavie 2005)."""
        from vlpet_tpu.evalsuite.caption import meteor

        s = meteor(["the cat sat on the mat"], [["the cat sat on the mat"]])
        assert s == pytest.approx(1.0 - 0.5 * (1 / 6) ** 3, abs=1e-9)

    def test_full_scramble_chunk_penalty(self):
        """Every aligned unigram its own chunk: chunks=m → Pen=0.5, and with
        P=R=1 the score is exactly 0.5."""
        from vlpet_tpu.evalsuite.caption import meteor

        s = meteor(["mat the on sat cat the"], [["the cat sat on the mat"]])
        assert s == pytest.approx(0.5, abs=1e-9)

    def test_stem_stage_matches_inflections(self):
        from vlpet_tpu.evalsuite.caption import meteor

        with_stem = meteor(["a man is walking"], [["a man is walked"]])
        disjoint = meteor(["a man is walking"], [["a man is flying"]])
        assert with_stem > disjoint

    def test_recall_weighted(self):
        """alpha=0.9 weights recall: a hypothesis missing reference words
        scores lower than one with extra words (same matches)."""
        from vlpet_tpu.evalsuite.caption import meteor

        missing = meteor(["the cat"], [["the cat sat on the mat"]])
        extra = meteor(["the cat sat on the mat tonight at home ok"],
                       [["the cat sat on the mat"]])
        assert extra > missing

    def test_empty_and_disjoint(self):
        from vlpet_tpu.evalsuite.caption import meteor

        assert meteor([""], [["a cat"]]) == 0.0
        assert meteor(["xxx yyy"], [["a cat"]]) == 0.0

    def test_best_reference_selected(self):
        from vlpet_tpu.evalsuite.caption import meteor

        multi = meteor(["a dog runs"], [["a cat sleeps", "a dog runs"]])
        single = meteor(["a dog runs"], [["a cat sleeps"]])
        assert multi > single


class TestTVQA:
    def test_per_type_accuracy(self):
        ds = [{"question_id": 1, "answer": 2, "type": "friends"},
              {"question_id": 2, "answer": 0, "type": "castle"}]
        ev = TVQAEvaluator(ds, ["friends", "castle"])
        res = ev.eval([{"question_id": 1, "answer": 2},
                       {"question_id": 2, "answer": 1}])
        assert res["friends"] == 1.0 and res["castle"] == 0.0
        assert res["overall"] == 0.5
