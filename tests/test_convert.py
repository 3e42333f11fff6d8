"""Torch->flax conversion rules validated against torch primitives."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from bevfusion_tpu.models.layers import Conv, Norm
from bevfusion_tpu.models.heads.transformer import MultiheadAttention
from bevfusion_tpu.runtime.convert import (
    bn_to_flax, conv2d_to_flax, deconv2d_to_flax, linear_to_flax, mha_to_flax,
)
import flax.linen as nn


def test_conv2d_parity():
    tm = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1)
    x = np.random.RandomState(0).randn(1, 3, 10, 12).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    fm = Conv(8, 3, 2, 1, use_bias=True)
    params = {"params": {"conv": conv2d_to_flax(
        tm.weight.detach().numpy(), tm.bias.detach().numpy())}}
    got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_deconv2d_parity():
    tm = torch.nn.ConvTranspose2d(4, 6, 2, stride=2, bias=False)
    x = np.random.RandomState(1).randn(1, 4, 5, 7).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    fm = nn.ConvTranspose(features=6, kernel_size=(2, 2), strides=(2, 2),
                          use_bias=False)
    params = {"params": deconv2d_to_flax(tm.weight.detach().numpy())}
    got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_bn_parity_eval():
    tm = torch.nn.BatchNorm2d(5, eps=1e-3, momentum=0.01)
    tm.eval()
    with torch.no_grad():
        tm.running_mean += torch.randn(5)
        tm.running_var *= 2.0
        tm.weight += torch.randn(5) * 0.1
        tm.bias += torch.randn(5) * 0.1
    x = np.random.RandomState(2).randn(2, 5, 4, 4).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    fm = Norm("BN", eps=1e-3, momentum=0.01)
    params, stats = bn_to_flax(
        tm.weight.detach().numpy(), tm.bias.detach().numpy(),
        tm.running_mean.numpy(), tm.running_var.numpy())
    vars_ = {"params": {"bn": params}, "batch_stats": {"bn": stats}}
    got = fm.apply(vars_, jnp.asarray(x.transpose(0, 2, 3, 1)), training=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5)


def test_mha_parity():
    E, H, L, B = 16, 4, 6, 2
    tm = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    x = np.random.RandomState(3).randn(L, B, E).astype(np.float32)
    want, _ = tm(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    want = want.detach().numpy()

    fm = MultiheadAttention(E, H, dropout=0.0)
    p = mha_to_flax(
        tm.in_proj_weight.detach().numpy(), tm.in_proj_bias.detach().numpy(),
        tm.out_proj.weight.detach().numpy(), tm.out_proj.bias.detach().numpy())
    xb = jnp.asarray(x.transpose(1, 0, 2))  # [B, L, E]
    got = fm.apply({"params": p}, xb, xb, xb)
    np.testing.assert_allclose(
        np.asarray(got).transpose(1, 0, 2), want, rtol=1e-3, atol=1e-4)


def test_linear_parity():
    tm = torch.nn.Linear(7, 9)
    x = np.random.RandomState(4).randn(3, 7).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()
    fm = nn.Dense(9)
    got = fm.apply({"params": linear_to_flax(
        tm.weight.detach().numpy(), tm.bias.detach().numpy())}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
