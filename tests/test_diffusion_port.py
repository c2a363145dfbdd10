"""Ported-weight numerical parity for the diffusion zoo (round-2 verdict
item #2): the reference's OWN torch modules — CLIP text encoder
(1.encoder.ipynb), VAE (2.vae.ipynb), UNet (3.unet.ipynb) — exec'd from
the notebook JSON with random weights, ported into our flax models, must
produce the same forward outputs (the `(a==b).all()` pattern the reference
itself used against HuggingFace, SURVEY.md §4.2).

The reference top-level VAE/UNet classes hardcode the SD dims
(512ch/64x64 attention, 320/640/1280 UNet), far too heavy for CI — so the
tests instantiate the reference's own size-parameterised building blocks
(Resnet, Pad, CrossAttention, Transformer, DownBlock, UpBlock) in the
EXACT topology of the reference top level (same Sequential indices /
attribute names, so the shipped porters apply unchanged), at small widths.
Only the VAE's Atten block is rebuilt inline at a parameterised width
(the notebook version hardcodes 512 channels and a 64x64 reshape)."""
import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gan_danet_tpu.models.diffusion import TextEncoder, UNet, VAE
from gan_danet_tpu.utils.torch_port import (
    port_diffusion_unet,
    port_diffusion_vae,
    port_text_encoder,
)


def _exec_notebook_cells(path, cell_indices):
    """TRUST NOTE: this exec()s code cells straight out of the read-only
    vendored reference snapshot at /root/reference — third-party content.
    That is acceptable ONLY because the snapshot is pinned and read-only
    in this environment; the cells are used as numerical oracles, never
    shipped. If the reference path ever becomes writable or fetched at
    test time, pin the cell sources by hash before exec'ing."""
    nb = json.loads(open(path).read())
    cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    ns = {"__name__": "_ref_diffusion"}
    for i in cell_indices:
        exec(compile("".join(cells[i]["source"]), f"{path}:cell{i}", "exec"),
             ns)
    return ns


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# CLIP text encoder (1.encoder.ipynb)
# ---------------------------------------------------------------------------

def test_text_encoder_forward_parity():
    """Embed + N x ClipEncoder + final LayerNorm (the cell-3 Sequential at
    4 layers instead of 12 — layer count is the only size knob; Embed's
    49408x768 table and the 768-wide blocks are the reference's own)."""
    ns = _exec_notebook_cells("/root/reference/1.encoder.ipynb", (0, 1, 2))
    torch.manual_seed(11)
    layers = 4
    ref = torch.nn.Sequential(
        ns["Embed"](), *[ns["ClipEncoder"]() for _ in range(layers)],
        torch.nn.LayerNorm(768)).eval()

    ids = torch.arange(77).unsqueeze(0) % 997
    with torch.no_grad():
        want = ref(ids).numpy()

    ours = TextEncoder(vocab_size=49408, max_length=77, width=768, heads=12,
                       layers=layers)
    params = port_text_encoder(_sd(ref), layers=layers)
    got = np.asarray(ours.apply({"params": params},
                                jnp.asarray(ids.numpy())))
    assert got.shape == want.shape == (1, 77, 768)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# VAE (2.vae.ipynb)
# ---------------------------------------------------------------------------

def _small_atten(dim):
    """The reference Atten (2.vae.ipynb cell 1) with its hardcoded 512
    width / 64x64 reshape generalised — same ops, same parameter names."""

    class Atten(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = torch.nn.GroupNorm(num_channels=dim,
                                           num_groups=min(32, dim), eps=1e-6)
            self.q = torch.nn.Linear(dim, dim)
            self.k = torch.nn.Linear(dim, dim)
            self.v = torch.nn.Linear(dim, dim)
            self.out = torch.nn.Linear(dim, dim)

        def forward(self, x):
            res = x
            b, c, h, w = x.shape
            x = self.norm(x)
            x = x.flatten(start_dim=2).transpose(1, 2)
            q, k, v = self.q(x), self.k(x), self.v(x)
            atten = torch.bmm(q, k.transpose(1, 2)) * c**-0.5
            atten = atten.softmax(dim=2)
            atten = self.out(atten.bmm(v))
            return atten.transpose(1, 2).reshape(b, c, h, w) + res

    return Atten()


def _build_ref_vae(ns, channels=(32, 64), latent=4, img_ch=3):
    """The reference VAE topology (2.vae.ipynb cell 3) from the
    reference's own Resnet/Pad classes, at small widths, with the exact
    Sequential index layout the porter expects."""
    Resnet, Pad = ns["Resnet"], ns["Pad"]
    n = len(channels)
    enc = [torch.nn.Conv2d(img_ch, channels[0], 3, padding=1)]
    prev = channels[0]
    for i, ch in enumerate(channels):
        stage = [Resnet(prev, ch), Resnet(ch, ch)]
        if i != n - 1:
            stage.append(torch.nn.Sequential(
                Pad(), torch.nn.Conv2d(ch, ch, 3, stride=2, padding=0)))
        enc.append(torch.nn.Sequential(*stage))
        prev = ch
    top = channels[-1]
    enc.append(torch.nn.Sequential(Resnet(top, top), _small_atten(top),
                                   Resnet(top, top)))
    enc.append(torch.nn.Sequential(
        torch.nn.GroupNorm(num_channels=top, num_groups=min(32, top),
                           eps=1e-6),
        torch.nn.SiLU(), torch.nn.Conv2d(top, 2 * latent, 3, padding=1)))
    enc.append(torch.nn.Conv2d(2 * latent, 2 * latent, 1))

    rev = list(reversed(channels))
    dec = [torch.nn.Conv2d(latent, latent, 1),
           torch.nn.Conv2d(latent, rev[0], 3, padding=1),
           torch.nn.Sequential(Resnet(rev[0], rev[0]), _small_atten(rev[0]),
                               Resnet(rev[0], rev[0]))]
    prev = rev[0]
    for i, ch in enumerate(rev):
        stage = [Resnet(prev, ch), Resnet(ch, ch), Resnet(ch, ch)]
        if i != n - 1:
            stage += [torch.nn.Upsample(scale_factor=2.0, mode="nearest"),
                      torch.nn.Conv2d(ch, ch, 3, padding=1)]
        dec.append(torch.nn.Sequential(*stage))
        prev = ch
    dec.append(torch.nn.Sequential(
        torch.nn.GroupNorm(num_channels=rev[-1], num_groups=min(32, rev[-1]),
                           eps=1e-6),
        torch.nn.SiLU(), torch.nn.Conv2d(rev[-1], img_ch, 3, padding=1)))

    vae = torch.nn.Module()
    vae.encoder = torch.nn.Sequential(*enc)
    vae.decoder = torch.nn.Sequential(*dec)
    return vae


def test_vae_forward_parity(rng):
    ns = _exec_notebook_cells("/root/reference/2.vae.ipynb", (0, 2))
    torch.manual_seed(12)
    channels = (32, 64)
    ref = _build_ref_vae(ns, channels).eval()

    ours = VAE(channels=channels, latent_channels=4, out_channels=3)
    params = port_diffusion_vae(_sd(ref), n_stages=len(channels))

    x = rng.standard_normal((2, 16, 20, 3)).astype(np.float32)
    with torch.no_grad():
        moments = ref.encoder(torch.from_numpy(x).permute(0, 3, 1, 2))
        want_mean = moments[:, :4].permute(0, 2, 3, 1).numpy()
        want_logvar = moments[:, 4:].permute(0, 2, 3, 1).numpy()
    got_mean, got_logvar = jax.tree.map(np.asarray, tuple(VAE(
        channels=channels, latent_channels=4, out_channels=3).apply(
        {"params": params}, jnp.asarray(x), method=VAE.encode)))
    assert got_mean.shape == want_mean.shape == (2, 8, 10, 4)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(got_logvar, want_logvar, rtol=1e-3, atol=2e-4)

    z = rng.standard_normal((2, 8, 10, 4)).astype(np.float32)
    with torch.no_grad():
        want_dec = ref.decoder(torch.from_numpy(z).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    got_dec = np.asarray(ours.apply({"params": params}, jnp.asarray(z),
                                    method=VAE.decode))
    assert got_dec.shape == want_dec.shape == (2, 16, 20, 3)
    np.testing.assert_allclose(got_dec, want_dec, rtol=1e-3, atol=3e-4)


@pytest.mark.slow
def test_vae_atten_parity_at_reference_width(rng):
    """The notebook's actual Atten block at its hardcoded (1,512,64,64)
    shape vs our SelfAttentionBlock — covers the one component the small
    VAE test rebuilds inline."""
    from gan_danet_tpu.models.diffusion.vae import SelfAttentionBlock
    from gan_danet_tpu.utils.torch_port import _vae_atten

    ns = _exec_notebook_cells("/root/reference/2.vae.ipynb", (0, 1, 2))
    torch.manual_seed(13)
    ref = ns["Atten"]().eval()
    x = rng.standard_normal((1, 64, 64, 512)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    sd = {f"a.{k}": v for k, v in _sd(ref).items()}
    params = _vae_atten(sd, "a")
    got = np.asarray(SelfAttentionBlock().apply({"params": params},
                                                jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


# ---------------------------------------------------------------------------
# UNet (3.unet.ipynb)
# ---------------------------------------------------------------------------

def _build_ref_unet(ns, channels=(32, 64, 96), latent=4):
    """The reference UNet topology (3.unet.ipynb cell 5) from the
    reference's own Resnet/Transformer/DownBlock/UpBlock classes at small
    widths (Resnet hardcodes the 1280 time width and Transformer the 768
    context width — kept). Attribute names match cell 5 so the shipped
    porter applies unchanged; forward mirrors cell 5's wiring."""
    Resnet, Transformer = ns["Resnet"], ns["Transformer"]
    DownBlock, UpBlock = ns["DownBlock"], ns["UpBlock"]
    c0, c1, c2 = channels

    class SmallUNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.in_vae = torch.nn.Conv2d(latent, c0, 3, padding=1)
            self.in_time = torch.nn.Sequential(
                torch.nn.Linear(320, 1280), torch.nn.SiLU(),
                torch.nn.Linear(1280, 1280))
            self.down_block0 = DownBlock(c0, c0)
            self.down_block1 = DownBlock(c0, c1)
            self.down_block2 = DownBlock(c1, c2)
            self.down_res0 = Resnet(c2, c2)
            self.down_res1 = Resnet(c2, c2)
            self.mid_res0 = Resnet(c2, c2)
            self.mid_tf = Transformer(c2)
            self.mid_res1 = Resnet(c2, c2)
            self.up_res0 = Resnet(2 * c2, c2)
            self.up_res1 = Resnet(2 * c2, c2)
            self.up_res2 = Resnet(2 * c2, c2)
            self.up_in = torch.nn.Sequential(
                torch.nn.Upsample(scale_factor=2, mode="nearest"),
                torch.nn.Conv2d(c2, c2, 3, padding=1))
            self.up_block0 = UpBlock(c1, c2, c2, True)
            self.up_block1 = UpBlock(c0, c1, c2, True)
            self.up_block2 = UpBlock(c0, c0, c1, False)
            self.out = torch.nn.Sequential(
                torch.nn.GroupNorm(num_channels=c0,
                                   num_groups=min(32, c0), eps=1e-5),
                torch.nn.SiLU(), torch.nn.Conv2d(c0, latent, 3, padding=1))

        def forward(self, out_vae, out_encoder, time):
            out_vae = self.in_vae(out_vae)

            e = torch.arange(160) * -9.210340371976184 / 160
            e = e.exp().to(time.device) * time
            time = torch.cat([e.cos(), e.sin()]).unsqueeze(dim=0)
            time = self.in_time(time)

            out_down = [out_vae]
            for blk in (self.down_block0, self.down_block1, self.down_block2):
                out_vae, out = blk(out_vae=out_vae, out_encoder=out_encoder,
                                   time=time)
                out_down.extend(out)
            out_vae = self.down_res0(out_vae, time)
            out_down.append(out_vae)
            out_vae = self.down_res1(out_vae, time)
            out_down.append(out_vae)

            out_vae = self.mid_res0(out_vae, time)
            out_vae = self.mid_tf(out_vae, out_encoder)
            out_vae = self.mid_res1(out_vae, time)

            for res in (self.up_res0, self.up_res1, self.up_res2):
                out_vae = res(torch.cat([out_vae, out_down.pop()], dim=1),
                              time)
            out_vae = self.up_in(out_vae)
            for blk in (self.up_block0, self.up_block1, self.up_block2):
                out_vae = blk(out_vae=out_vae, out_encoder=out_encoder,
                              time=time, out_down=out_down)
            return self.out(out_vae)

    return SmallUNet()


def test_unet_forward_parity(rng):
    ns = _exec_notebook_cells("/root/reference/3.unet.ipynb", (0, 1, 2, 3, 4))
    torch.manual_seed(14)
    channels = (32, 64, 96)
    ref = _build_ref_unet(ns, channels).eval()

    ours = UNet(in_channels=4, out_channels=4, channels=channels,
                context_dim=768, heads=8, fourier_dim=320, time_dim=1280)
    params = port_diffusion_unet(_sd(ref), n_levels=len(channels))

    z = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)  # NCHW
    ctx = rng.standard_normal((2, 7, 768)).astype(np.float32)
    t = torch.LongTensor([26])
    with torch.no_grad():
        want = ref(torch.from_numpy(z), torch.from_numpy(ctx), t) \
            .permute(0, 2, 3, 1).numpy()
    got = np.asarray(ours.apply(
        {"params": params}, jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
        jnp.asarray(ctx), jnp.asarray([26], jnp.int32)))
    assert got.shape == want.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
