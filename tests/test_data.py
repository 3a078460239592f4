"""Data pipeline: collation shapes, VQA answer sampling, NLVR pairing,
multitask schedule parity, feature packing."""

import numpy as np
import pytest

from vlpet_tpu.data.datasets import (
    DatasetConfig,
    Loader,
    TaskDataset,
    synthetic_task_data,
)
from vlpet_tpu.data.features import (
    DictFeatureSource,
    PackedFeatureSource,
    pack_features,
    resize_time_axis,
)
from vlpet_tpu.data.multitask import MultitaskLoader
from vlpet_tpu.data.tokenization import WhitespaceTokenizer


def make_loader(task, n=20, batch_size=4, **kw):
    examples, source = synthetic_task_data(task, n, n_boxes=4, feat_dim=8)
    cfg = DatasetConfig(task=task, max_text_length=12, gen_max_length=6,
                        n_boxes=4, feat_dim=8, prompt=f"{task}: ", **kw)
    ds = TaskDataset(cfg, examples, source, WhitespaceTokenizer())
    return Loader(ds, batch_size)


class TestCollation:
    def test_fixed_shapes(self):
        loader = make_loader("vqa")
        batch = next(iter(loader))
        assert batch["input_ids"].shape == (4, 12)
        assert batch["attention_mask"].shape == (4, 12)
        assert batch["target_ids"].shape == (4, 6)
        assert batch["vis_feats"].shape == (4, 4, 8)
        assert batch["boxes"].shape == (4, 4, 4)
        assert batch["scores"].shape == (4,)
        assert batch["task"] == "vqa"

    def test_target_padding_is_ignore_index(self):
        loader = make_loader("vqa")
        batch = next(iter(loader))
        # every row has at least one valid token and trailing -100s
        t = batch["target_ids"]
        assert (t[:, 0] != -100).all()
        assert (t == -100).any()

    def test_nlvr_pairs_images(self):
        loader = make_loader("nlvr")
        batch = next(iter(loader))
        assert batch["vis_feats"].shape == (4, 8, 8)  # 2 * 4 boxes
        assert batch["img_order_ids"].shape == (4, 8)
        assert set(np.unique(batch["img_order_ids"])) == {0, 1}
        oo = batch["obj_order_ids"][0]
        np.testing.assert_array_equal(oo[:4], oo[4:])


class TestVQASampling:
    def test_answer_sampled_from_label_distribution(self):
        examples, source = synthetic_task_data("vqa", 5, n_boxes=4, feat_dim=8)
        examples[0]["label"] = {"yes": 1.0}
        cfg = DatasetConfig(task="vqa", n_boxes=4, feat_dim=8)
        ds = TaskDataset(cfg, examples, source, WhitespaceTokenizer())
        item = ds[0]
        assert item["answer"] == "yes"
        assert item["score"] == 1.0


class TestLoader:
    def test_epoch_shuffling_is_seeded(self):
        loader = make_loader("caption", n=16)
        loader.set_epoch(1)
        b1 = [b["question_ids"] for b in loader]
        loader.set_epoch(1)
        b2 = [b["question_ids"] for b in loader]
        assert b1 == b2
        loader.set_epoch(2)
        b3 = [b["question_ids"] for b in loader]
        assert b1 != b3

    def test_sharding_partitions(self):
        l0 = make_loader("caption", n=16, batch_size=2)
        l0.shard, l0.num_shards = 0, 2
        l1 = make_loader("caption", n=16, batch_size=2)
        l1.shard, l1.num_shards = 1, 2
        ids0 = {q for b in l0 for q in b["question_ids"]}
        ids1 = {q for b in l1 for q in b["question_ids"]}
        assert not (ids0 & ids1)

    def test_sharded_eval_covers_everything_once(self):
        """drop_last=False eval shards partition the dataset exactly — the
        multi-host predict path then merges them (DistributedSampler
        semantics, reference caption_clip_data.py:372-377)."""
        full = make_loader("caption", n=17, batch_size=4)
        full.shuffle = full.drop_last = False
        want = [q for b in full for q in b["question_ids"]]
        got = []
        for s in range(3):
            l = make_loader("caption", n=17, batch_size=4)
            l.shuffle = l.drop_last = False
            l.shard, l.num_shards = s, 3
            got.extend(q for b in l for q in b["question_ids"])
        assert sorted(got) == sorted(want)
        assert len(got) == len(set(got))

    def test_merge_predict_results(self):
        from vlpet_tpu.parallel.multihost import merge_predict_results

        merged = merge_predict_results([
            {"quesid2ans": {1: "a"}, "predictions": ["a"], "targets": [["x"]]},
            {"quesid2ans": {2: "b"}, "predictions": ["b"], "targets": [["y"]]},
        ])
        assert merged["quesid2ans"] == {1: "a", 2: "b"}
        assert merged["predictions"] == ["a", "b"]
        assert merged["targets"] == [["x"], ["y"]]

    def test_all_gather_objects_single_process(self):
        from vlpet_tpu.parallel.multihost import all_gather_objects

        assert all_gather_objects({"k": [1, 2]}) == [{"k": [1, 2]}]


class TestMultitask:
    def test_roundrobin_schedule_counts(self):
        loaders = [make_loader("vqa", n=16), make_loader("caption", n=8)]
        ml = MultitaskLoader(loaders, sampling="roundrobin")
        tasks = [b["task"] for b in ml]
        assert tasks.count("vqa") == 4 and tasks.count("caption") == 2

    def test_schedule_is_epoch_seeded(self):
        loaders = [make_loader("vqa", n=16), make_loader("caption", n=16)]
        ml = MultitaskLoader(loaders, sampling="roundrobin")
        ml.set_epoch(3)
        s1 = list(ml.epoch_tasks)
        ml.set_epoch(3)
        assert s1 == list(ml.epoch_tasks)

    def test_balanced_sampling(self):
        loaders = [make_loader("vqa", n=32), make_loader("caption", n=8)]
        ml = MultitaskLoader(loaders, sampling="balanced")
        tasks = [b["task"] for b in ml]
        assert tasks.count("vqa") == tasks.count("caption")


class TestFeatures:
    def test_pack_roundtrip(self, tmp_path):
        src = DictFeatureSource(
            {f"i{k}": np.random.rand(4, 8).astype(np.float32) for k in range(5)})
        prefix = str(tmp_path / "packed")
        pack_features(src, src.ids(), prefix)
        packed = PackedFeatureSource(prefix)
        f1, b1 = src.get("i3")
        f2, b2 = packed.get("i3")
        np.testing.assert_array_equal(f1, f2)

    def test_resize_time_axis(self):
        x = np.arange(10, dtype=np.float32)[:, None]
        up = resize_time_axis(x, 16)
        assert up.shape == (16, 1)
        assert (up[10:] == x[-1]).all()
        down = resize_time_axis(x, 4)
        assert down.shape == (4, 1)
        # adaptive max pooling: last bin covers the tail
        assert down[-1, 0] == 9


def test_image_folder_source(tmp_path):
    from PIL import Image

    from vlpet_tpu.data.features import ImageFolderSource

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    src = ImageFolderSource(str(tmp_path), image_size=32)
    img, _ = src.get("img1")
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    assert set(src.ids()) == {"img0", "img1", "img2"}
