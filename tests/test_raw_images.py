"""Raw-pixel VSE++ path: Flickr-style dataset + CNN tower + torch converter."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from itrx.data.raw_images import RawImageDataset
from itrx.models import get_model
from itrx.models.cnn import VGG19, load_torch_cnn


@pytest.fixture(scope="module")
def flickr_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rawf30k")
    imgdir = root / "images"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    images = []
    for i in range(6):
        arr = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(arr).save(imgdir / name)
        sentences = [
            {"raw": f"a photo number {i} with a dog"} for _ in range(5)
        ]
        images.append(
            {
                "filename": name,
                "split": "train" if i < 4 else ("val" if i == 4 else "test"),
                "sentences": sentences,
            }
        )
    with open(root / "dataset_flickr30k.json", "w") as f:
        json.dump({"images": images}, f)
    return str(root)


def _cfg(flickr_dir):
    return {
        "name": "VSE_PP",
        "data_name": "f30k",
        "vocab_path": os.path.join(flickr_dir, "vocab"),
        "vocab_type": "json",
        "crop_size": 32,
        "pad_words": 32,
        "text_encoder": "gru",
    }


def test_raw_dataset_and_transforms(flickr_dir):
    ds = RawImageDataset(flickr_dir, "f30k", "train", _cfg(flickr_dir))
    assert len(ds) == 20 and ds.im_div == 5
    b = next(iter(ds.train_batches(4, seed=0)))
    assert b["images"].shape == (4, 32, 32, 3)
    assert np.isfinite(b["images"]).all()
    # eval path: deterministic center crop
    e1 = next(iter(ds.eval_batches(4)))
    e2 = next(iter(ds.eval_batches(4)))
    np.testing.assert_array_equal(e1["images"], e2["images"])


def test_vsepp_full_encoder_forward(flickr_dir):
    ds = RawImageDataset(flickr_dir, "f30k", "train", _cfg(flickr_dir))
    cfg = dict(
        name="VSE_PP", vocab_size=ds.vocab_size, embed_size=16, word_dim=8,
        measure="cosine", use_abs=False, no_imgnorm=False, margin=0.2,
        max_violation=False, data_name="f30k", img_encoder="vgg19",
        finetune=False,
    )
    model = get_model(cfg)
    b = next(iter(ds.train_batches(2, seed=0)))
    b = jax.tree.map(jnp.asarray, b)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, train=True,
    )
    (loss, aux), _ = model.apply(
        v, b, train=True, rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert np.isfinite(float(loss))
    # frozen CNN: zero grads through the tower
    def loss_fn(p):
        out, _ = model.apply(
            {"params": p}, b, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return out[0]

    grads = jax.grad(loss_fn)(v["params"])
    cnn_g = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["img_enc"]["cnn"])
    )
    assert cnn_g == 0.0


def test_vgg19_torch_weight_conversion(tmp_path, rng):
    torch = pytest.importorskip("torch")
    # build a torchvision-layout vgg19 state dict without torchvision
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    sd = {}
    idx = 0
    in_c = 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = torch.randn(v, in_c, 3, 3) * 0.01
        sd[f"features.{idx}.bias"] = torch.zeros(v)
        in_c = v
        idx += 2  # conv + relu
    sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7) * 0.001
    sd["classifier.0.bias"] = torch.zeros(4096)
    sd["classifier.3.weight"] = torch.randn(4096, 4096) * 0.001
    sd["classifier.3.bias"] = torch.zeros(4096)
    path = tmp_path / "vgg19.pth"
    torch.save(sd, str(path))

    params, stats = load_torch_cnn(str(path), "vgg19")
    assert params["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["fc7"]["kernel"].shape == (4096, 4096)

    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    out = VGG19().apply({"params": params}, x)
    assert out.shape == (1, 4096)
    assert np.isfinite(np.asarray(out)).all()


def test_gather_workers_deterministic_and_concurrent(flickr_dir):
    """workers=8 parallel decode yields byte-identical batches to workers=0
    (per-image spawned RNGs make crops independent of thread scheduling)."""
    cfg0 = dict(_cfg(flickr_dir), workers=0)
    cfg8 = dict(_cfg(flickr_dir), workers=8)
    ds0 = RawImageDataset(flickr_dir, "f30k", "train", cfg0)
    ds8 = RawImageDataset(flickr_dir, "f30k", "train", cfg8)
    b0 = next(iter(ds0.train_batches(4, seed=3)))
    b8 = next(iter(ds8.train_batches(4, seed=3)))
    np.testing.assert_array_equal(b0["images"], b8["images"])
    np.testing.assert_array_equal(b0["cap_ids"], b8["cap_ids"])
    # the pool actually exists and is shared across gathers
    assert ds8._pool is not None and ds0.__dict__.get("_pool") is None


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    """Tiny coco layout: 4 train2014 images, 6 val2014 images of which 2 are
    dev, 2 test, 2 restval (5 captions each)."""
    root = tmp_path_factory.mktemp("rawcoco")
    ann = root / "annotations"
    ann.mkdir()
    rng = np.random.default_rng(1)
    aid = [0]

    def build(sub, n, id0):
        (root / "images" / sub).mkdir(parents=True, exist_ok=True)
        images, annotations = [], []
        for i in range(n):
            img_id = id0 + i
            name = f"{sub}_{i}.jpg"
            arr = rng.integers(0, 255, (48, 56, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / "images" / sub / name)
            images.append({"id": img_id, "file_name": name})
            for _ in range(5):
                annotations.append(
                    {
                        "id": aid[0],
                        "image_id": img_id,
                        "caption": f"picture {img_id} of a cat",
                    }
                )
                aid[0] += 1
        return {"images": images, "annotations": annotations}

    train = build("train2014", 4, 0)
    val = build("val2014", 6, 100)
    with open(ann / "captions_train2014.json", "w") as f:
        json.dump(train, f)
    with open(ann / "captions_val2014.json", "w") as f:
        json.dump(val, f)
    val_aids = [a["id"] for a in val["annotations"]]
    np.save(ann / "coco_train_ids.npy",
            np.array([a["id"] for a in train["annotations"]]))
    np.save(ann / "coco_dev_ids.npy", np.array(val_aids[:10]))
    np.save(ann / "coco_test_ids.npy", np.array(val_aids[10:20]))
    return str(root)


def test_coco_restval_split_sizes(coco_dir):
    """use_restval=True trains on train2014 + val2014-minus-dev/test
    (ref data_loader.py:274-287); False keeps train2014 only."""
    cfg = dict(_cfg(coco_dir), data_name="coco")
    base = RawImageDataset(coco_dir, "coco", "train", dict(cfg))
    assert len(base) == 20  # 4 images x 5 captions
    rv = RawImageDataset(coco_dir, "coco", "train", dict(cfg, use_restval=True))
    # +2 restval images x 5 captions (the val2014 remainder)
    assert len(rv) == 30
    restval_paths = set(rv.paths) - set(base.paths)
    assert all("val2014" in p for p in restval_paths)
    assert len({p for p in restval_paths}) == 2
    # dev split unaffected
    dev = RawImageDataset(coco_dir, "coco", "dev", dict(cfg))
    assert len(dev) == 10
    # the restval images must be loadable through the normal batch path
    b = next(iter(rv.train_batches(5, seed=0)))
    assert np.isfinite(b["images"]).all()
