"""Loss parity tests vs torch oracles implementing the reference formulas
(itr/modalmodule/Objectives.py)."""

import numpy as np
import torch

from itrx.ops import losses


def oracle_contrastive(scores, margin, max_violation):
    scores = torch.tensor(scores)
    diagonal = scores.diag().view(scores.size(0), 1)
    d1 = diagonal.expand_as(scores)
    d2 = diagonal.t().expand_as(scores)
    cost_s = (margin + scores - d1).clamp(min=0)
    cost_im = (margin + scores - d2).clamp(min=0)
    mask = torch.eye(scores.size(0)) > 0.5
    cost_s = cost_s.masked_fill_(mask, 0)
    cost_im = cost_im.masked_fill_(mask, 0)
    if max_violation:
        cost_s = cost_s.max(1)[0]
        cost_im = cost_im.max(0)[0]
    return float(cost_s.sum() + cost_im.sum())


def test_contrastive_sum(rng):
    s = rng.standard_normal((16, 16)).astype(np.float32)
    got = float(losses.contrastive_hinge(s, 0.2, False))
    np.testing.assert_allclose(got, oracle_contrastive(s, 0.2, False), rtol=1e-5)


def test_contrastive_max_violation(rng):
    s = rng.standard_normal((16, 16)).astype(np.float32)
    got = float(losses.contrastive_hinge(s, 0.2, True))
    np.testing.assert_allclose(got, oracle_contrastive(s, 0.2, True), rtol=1e-5)


def test_diversity_regularization(rng):
    sm = rng.standard_normal((6, 36, 12)).astype(np.float32)
    smt = torch.tensor(sm)
    n = torch.nn.functional.normalize(smt, dim=1)
    g = torch.matmul(n.transpose(1, 2), n)
    want = float(((g - torch.eye(12).unsqueeze(0)) ** 2).sum())
    got = float(losses.diversity_regularization(sm))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_language_model_loss(rng):
    b, t, v = 4, 7, 50
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logprobs = torch.log_softmax(torch.tensor(logits), dim=-1)
    targets = rng.integers(0, v, size=(b, t + 2))
    mask = (rng.random((b, t + 2)) > 0.3).astype(np.float32)
    lt = torch.tensor(targets[:, :t])
    mt = torch.tensor(mask[:, :t])
    nll = torch.nn.NLLLoss(reduction="none")(
        logprobs.reshape(-1, v), lt.reshape(-1)
    )
    want = float((nll * mt.reshape(-1)).sum() / b)
    got = float(
        losses.language_model_loss(np.asarray(logprobs), targets, mask)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _oracle_angular(im, s, angle_bound=1.0, max_violation=True):
    im, s = torch.tensor(im), torch.tensor(s)
    n = im.shape[0]
    neg_idx = torch.tensor(
        np.array([[j for j in range(n) if j != i] for i in range(n)])
    )

    def one(anchors, positives, negatives):
        a = anchors.unsqueeze(1)
        p = positives.unsqueeze(1)
        x = 4.0 * angle_bound * torch.matmul(
            (a + p), negatives.transpose(1, 2)
        ) - 2.0 * (1.0 + angle_bound) * torch.matmul(a, p.transpose(1, 2))
        if max_violation:
            cost = x.max(2)[0]
            return torch.log(1 + torch.exp(cost)).sum()
        t = torch.max(x, dim=2)[0]
        e = torch.exp(x - t.unsqueeze(1))
        return torch.mean(t + torch.log(torch.exp(-t) + e.sum(2)))

    return float(one(im, s, s[neg_idx]) + one(s, im, im[neg_idx]))


def test_angular_loss_max_violation(rng):
    im = rng.standard_normal((10, 24)).astype(np.float32)
    s = rng.standard_normal((10, 24)).astype(np.float32)
    # normalize like SAEM embeddings
    im /= np.linalg.norm(im, axis=1, keepdims=True)
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    got = float(losses.angular_loss(im, s, 1.0, True))
    np.testing.assert_allclose(got, _oracle_angular(im, s, 1.0, True), rtol=1e-4)


def test_angular_loss_mean(rng):
    im = rng.standard_normal((8, 16)).astype(np.float32)
    s = rng.standard_normal((8, 16)).astype(np.float32)
    got = float(losses.angular_loss(im, s, 1.0, False))
    np.testing.assert_allclose(got, _oracle_angular(im, s, 1.0, False), rtol=1e-4)


def test_npair_loss(rng):
    im = rng.standard_normal((8, 16)).astype(np.float32) * 0.1
    s = rng.standard_normal((8, 16)).astype(np.float32) * 0.1
    imt, st = torch.tensor(im), torch.tensor(s)
    n = 8
    neg_idx = torch.tensor(
        np.array([[j for j in range(n) if j != i] for i in range(n)])
    )

    def one(anchors, positives, negatives, max_violation):
        a = anchors.unsqueeze(1)
        p = positives.unsqueeze(1)
        x = torch.matmul(a, (negatives - p).transpose(1, 2))
        if max_violation:
            return torch.log(1 + x.max(2)[0]).sum()
        return torch.mean(torch.log(1 + torch.sum(torch.exp(x), 2)))

    for mv in (True, False):
        want = float(one(imt, st, st[neg_idx], mv) + one(st, imt, imt[neg_idx], mv))
        got = float(losses.npair_loss(im, s, mv))
        np.testing.assert_allclose(got, want, rtol=1e-4)
