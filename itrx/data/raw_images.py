"""Raw-image datasets for VSE++ (ref itr/datamodule/data_loader.py:239-461).

Flickr30k/Flickr8k via the Karpathy split json and MS-COCO via the standard
`captions_*2014.json` annotation files (parsed directly — no pycocotools).
Transforms replicate the torchvision pipeline (ref :305-319): train =
RandomResizedCrop(224) + HFlip, eval = Resize(256) + CenterCrop(224), then
ImageNet normalization.  Images come out NHWC float32 for the flax CNN tower.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from . import vocab as vocab_mod
from .treebank import word_tokenize

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _normalize(arr):
    return (arr / 255.0 - _MEAN) / _STD


def random_resized_crop(img: Image.Image, size: int, rng: np.random.Generator):
    """torchvision RandomResizedCrop(size): scale (0.08,1.0), ratio (3/4,4/3)."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = rng.uniform(0.08, 1.0) * area
        log_ratio = (np.log(3 / 4), np.log(4 / 3))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.integers(0, w - cw + 1)
            y = rng.integers(0, h - ch + 1)
            img = img.crop((x, y, x + cw, y + ch))
            return img.resize((size, size), Image.BILINEAR)
    return center_crop(resize_short(img, size), size)


def resize_short(img: Image.Image, size: int):
    w, h = img.size
    if w < h:
        return img.resize((size, int(size * h / w)), Image.BILINEAR)
    return img.resize((int(size * w / h), size), Image.BILINEAR)


def center_crop(img: Image.Image, size: int):
    w, h = img.size
    x = (w - size) // 2
    y = (h - size) // 2
    return img.crop((x, y, x + size, y + size))


def load_image(path: str, train: bool, crop_size: int,
               rng: np.random.Generator | None = None):
    img = Image.open(path).convert("RGB")
    if train:
        img = random_resized_crop(img, crop_size, rng)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
    else:
        img = center_crop(resize_short(img, 256), crop_size)
    return _normalize(np.asarray(img, np.float32))


class RawImageDataset:
    """Caption/image-path pairs with the PrecompDataset batching API."""

    def __init__(self, data_path, data_name, split, config):
        self.config = config
        self.split = split
        self.crop_size = config.get("crop_size", 224)

        if "coco" in data_name:
            self._init_coco(data_path, split, config)
        else:
            self._init_flickr(data_path, data_name, split)

        voc = self._load_vocab(config)
        self.vocab_size = len(voc)
        seqs = [
            [voc(vocab_mod.START)]
            + [voc(t) for t in word_tokenize(c.lower())]
            + [voc(vocab_mod.END)]
            for c in self.captions
        ]
        L = min(
            ((max(len(s) for s in seqs) + 7) // 8) * 8,
            config.get("pad_words", 96),
        )
        n = len(seqs)
        self.cap_ids = np.zeros((n, L), np.int32)
        self.cap_mask = np.zeros((n, L), np.float32)
        for i, s in enumerate(seqs):
            s = s[:L]
            self.cap_ids[i, : len(s)] = s
            self.cap_mask[i, : len(s)] = 1.0
        self.length = n
        # Karpathy splits list 5 sentences per image consecutively, so the
        # eval engine's [::5] image dedup applies (ref utils.py:155)
        self.im_div = 5 if n % 5 == 0 else 1

    def _init_flickr(self, data_path, data_name, split):
        json_name = (
            "dataset_flickr30k.json" if "f30k" in data_name
            else "dataset_flickr8k.json"
        )
        with open(os.path.join(data_path, json_name)) as f:
            dataset = json.load(f)["images"]
        root = os.path.join(data_path, "images")
        self.captions, self.paths = [], []
        split_name = {"dev": "val"}.get(split, split)
        for d in dataset:
            if d["split"] != split_name:
                continue
            for s in d["sentences"]:
                self.captions.append(s["raw"])
                self.paths.append(os.path.join(root, d["filename"]))

    def _init_coco(self, data_path, split, config):
        capdir = os.path.join(data_path, "annotations")
        imgdir = os.path.join(data_path, "images")
        ann_file = {
            "train": "captions_train2014.json",
            "dev": "captions_val2014.json",
            "val": "captions_val2014.json",
            "test": "captions_val2014.json",
        }[split]
        img_sub = "train2014" if split == "train" else "val2014"
        self.captions, self.paths = [], []
        self._append_coco_split(capdir, imgdir, ann_file, img_sub, split)
        if split == "train" and config.get("use_restval"):
            # Karpathy restval: the val2014 images that are in neither the
            # dev-5000 nor test-5000 folds join the training split
            # (ref data_loader.py:274-287 'trainrestval' + :372-376)
            self._append_coco_split(
                capdir, imgdir, "captions_val2014.json", "val2014", "restval"
            )

    def _append_coco_split(self, capdir, imgdir, ann_file, img_sub, split):
        with open(os.path.join(capdir, ann_file)) as f:
            coco = json.load(f)
        img_by_id = {im["id"]: im["file_name"] for im in coco["images"]}
        anns = {a["id"]: a for a in coco["annotations"]}
        ids_file = {
            "train": "coco_train_ids.npy",
            "restval": "coco_restval_ids.npy",
            "dev": "coco_dev_ids.npy",
            "val": "coco_dev_ids.npy",
            "test": "coco_test_ids.npy",
        }[split]
        ids_path = os.path.join(capdir, ids_file)
        if os.path.exists(ids_path):
            ann_ids = np.load(ids_path)
            if split in ("dev", "val"):
                ann_ids = ann_ids[:5000]
        elif split == "restval":
            # no restval ids file shipped: derive it as val2014 minus the
            # dev/test folds (matches the Karpathy-split snippet the
            # reference documents at data_loader.py:243-252)
            used = set()
            for f_ in ("coco_dev_ids.npy", "coco_test_ids.npy"):
                p = os.path.join(capdir, f_)
                if os.path.exists(p):
                    used.update(int(i) for i in np.load(p))
            ann_ids = [i for i in anns.keys() if i not in used]
        else:
            ann_ids = list(anns.keys())
        for aid in ann_ids:
            a = anns[int(aid)]
            self.captions.append(a["caption"])
            self.paths.append(
                os.path.join(imgdir, img_sub, img_by_id[a["image_id"]])
            )

    def _load_vocab(self, config):
        vtype = config.get("vocab_type", "pkl")
        for ext, loader in (
            ("json", vocab_mod.deserialize_vocab),
            ("pkl", vocab_mod.load_vocab_pkl),
        ):
            path = os.path.join(
                config["vocab_path"], f"{config['data_name']}_vocab.{ext}"
            )
            if os.path.exists(path):
                return loader(path)
        voc = vocab_mod.build_vocab(self.captions, threshold=4)
        os.makedirs(config["vocab_path"], exist_ok=True)
        vocab_mod.serialize_vocab(
            voc,
            os.path.join(config["vocab_path"], f"{config['data_name']}_vocab.json"),
        )
        return voc

    def __len__(self):
        return self.length

    def _executor(self, workers: int):
        if getattr(self, "_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
        return self._pool

    def gather(self, idx, train=False, rng=None):
        """PIL decode + transform, parallelized over `workers` threads
        (honoring the reference's num_workers loader knob,
        data_loader.py:181-196).  Each image draws its crop/flip randomness
        from its own child generator spawned from `rng`, so batch content is
        deterministic for a fixed seed regardless of thread scheduling or
        worker count.  PIL's JPEG decode releases the GIL, so threads give
        real concurrency for the decode+resize work.
        """
        rngs = rng.spawn(len(idx)) if rng is not None else [None] * len(idx)
        workers = int(self.config.get("workers", 0) or 0)

        def load_one(i, r):
            return load_image(self.paths[i], train, self.crop_size, r)

        if workers > 1 and len(idx) > 1:
            imgs = np.stack(
                list(self._executor(workers).map(load_one, idx, rngs))
            )
        else:
            imgs = np.stack([load_one(i, r) for i, r in zip(idx, rngs)])
        return {
            "images": imgs,
            "cap_ids": self.cap_ids[idx],
            "cap_mask": self.cap_mask[idx],
            "ids": idx.astype(np.int32),
        }

    def train_batches(self, batch_size, seed=0, epoch=0):
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(self.length)
        for b in range(self.length // batch_size):
            yield self.gather(
                order[b * batch_size : (b + 1) * batch_size], train=True, rng=rng
            )

    def eval_batches(self, batch_size):
        for start in range(0, self.length, batch_size):
            idx = np.arange(start, min(start + batch_size, self.length))
            n_valid = len(idx)
            if n_valid < batch_size:
                idx = np.concatenate([idx, np.zeros(batch_size - n_valid, np.int64)])
            batch = self.gather(idx, train=False)
            batch["n_valid"] = n_valid
            yield batch
