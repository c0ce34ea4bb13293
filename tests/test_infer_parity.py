"""Full-volume inference parity against the reference decoder's exact math.

Implements the reference's ``inference()`` algorithm (reference
test.py:38-207) verbatim in numpy+torch — its Normalization, odd-Z edge pad,
clamped patch grid, per-patch [-1,1] scaling, torch generator forward,
uniform overlap-add, and the "+0.01 after dividing" bias (reference
test.py:178) — then decodes the SAME volume through our test.py CLI
(sliding_window_inference, uniform blend, pad_mode=reference) with the same
imported weights, and asserts the outputs are identical up to the one
recorded deviation: we do not add the +0.01 intensity bias.

This operationalizes BASELINE.md's "SSIM/PSNR parity with the PyTorch
reference" contract: identical decoded volumes (up to a constant bias and
float error) have identical SSIM/PSNR against any target. Measured deltas
are recorded in PARITY.md.
"""
import importlib.util
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mra_gan_tpu.checkpoint import CheckpointManager, load_torch_network  # noqa: E402
from mra_gan_tpu.data import nifti  # noqa: E402
from mra_gan_tpu.data.transforms import rescale_0_255  # noqa: E402
from mra_gan_tpu.models.cycle_gan import CycleGANConfig, create_state  # noqa: E402

REF_NETWORKS = "/root/reference/models/networks3D.py"
PATCH = (16, 16, 16)
STRIDE_INPLANE, STRIDE_LAYER = 8, 4


@pytest.fixture(scope="module")
def ref_nets():
    if "monai" not in sys.modules:
        monai = types.ModuleType("monai")
        networks = types.ModuleType("monai.networks")
        nets = types.ModuleType("monai.networks.nets")
        nets.DynUNet = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("monai is not installed"))
        networks.nets = nets
        monai.networks = networks
        sys.modules["monai"] = monai
        sys.modules["monai.networks"] = networks
        sys.modules["monai.networks.nets"] = nets
    spec = importlib.util.spec_from_file_location("ref_networks3D_p", REF_NETWORKS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_inference_math(volume, tnet, patch, stride_inplane, stride_layer):
    """The reference's decode loop, line for line (reference test.py:56-185):
    Normalization -> odd-Z edge pad -> clamped grid -> per-patch scale,
    torch forward (train mode, no_grad, reference base_model.py:53), rescale
    -> uniform scatter-add -> label/weight + 0.01 -> crops."""
    image_np = rescale_0_255(volume)  # Normalization (NiftiDataset.py:639-654)
    orig = image_np.shape
    # Padding transform: zero-extend up to the patch size with unchanged
    # spacing/origin (reference utils/NiftiDataset.py:876-932; test.py:81-82),
    # applied AFTER Normalization; test.py:185 crops it back off
    image_np = np.pad(image_np,
                      [(0, max(0, p - s)) for p, s in zip(patch, orig)])
    padded = False
    if image_np.shape[2] % 2 == 1:  # test.py:98-103
        image_np = np.pad(image_np, ((0, 0), (0, 0), (0, 1)), "edge")
        padded = True
    label_np = np.zeros(image_np.shape, np.float32)
    weight_np = np.zeros(image_np.shape, np.float32)

    px, py, pz = patch
    inum = int(math.ceil((image_np.shape[0] - px) / float(stride_inplane))) + 1
    jnum = int(math.ceil((image_np.shape[1] - py) / float(stride_inplane))) + 1
    knum = int(math.ceil((image_np.shape[2] - pz) / float(stride_layer))) + 1
    for i in range(inum):  # test.py:119-145 incl. boundary clamping
        for j in range(jnum):
            for k in range(knum):
                istart = min(i * stride_inplane, image_np.shape[0] - px)
                jstart = min(j * stride_inplane, image_np.shape[1] - py)
                kstart = min(k * stride_layer, image_np.shape[2] - pz)
                sl = (slice(istart, istart + px), slice(jstart, jstart + py),
                      slice(kstart, kstart + pz))
                x = (image_np[sl] - 127.5) / 127.5  # test.py:152
                with torch.no_grad():
                    pred = tnet(torch.tensor(x[None, None]))  # NCDHW, D=x
                pred = pred.squeeze().numpy() * 127.5 + 127.5  # test.py:164
                label_np[sl] += pred
                weight_np[sl] += 1.0
    label_np = label_np / weight_np + 0.01  # test.py:178 — bias AFTER divide
    if padded:
        label_np = label_np[:, :, :-1]  # test.py:181-182
    return label_np[: orig[0], : orig[1], : orig[2]]  # test.py:185


@pytest.mark.parametrize("shape", [(20, 18, 17), (20, 14, 17)])
def test_sliding_window_matches_reference_decoder(ref_nets, shape, tmp_path):
    """shape (20,18,17): odd Z exercises the reference's edge pad;
    (20,14,17): Y below patch size exercises the Padding-transform
    equivalence (zero-extend at the high side) on top of it."""
    sys.path.insert(0, "/root/repo")
    import test as test_cli

    tg = ref_nets.define_G(1, 1, 4, "resnet_6blocks", norm="instance")
    g = torch.Generator().manual_seed(11)
    for p in tg.parameters():
        p.data = torch.randn(p.shape, generator=g) * 0.1

    # identical weights into a checkpoint our test.py CLI can load
    cfg = CycleGANConfig(ngf=4, ndf=4, n_layers_d=1, pool_size=1)
    state = create_state(cfg, jax.random.PRNGKey(0), PATCH)
    pth = tmp_path / "g.pth"
    torch.save(tg.state_dict(), pth)
    g_params = dict(state.g_params)
    g_params["g_a"] = load_torch_network(pth, state.g_params["g_a"],
                                         arch="resnet")
    ck = CheckpointManager(tmp_path / "ck", "parity")
    ck.save("latest", state.replace(g_params=g_params), also_latest=False)

    rs = np.random.RandomState(3)
    vol = (rs.rand(*shape).astype(np.float32) * 90 + 10)
    vol[5:12, 4:9, 3:9] += 120  # structure, so min-max rescale is non-trivial
    nifti.save(nifti.NiftiImage(data=vol, affine=np.eye(4)),
               tmp_path / "in.nii")

    out_path = tmp_path / "fake.nii"
    test_cli.main([
        "--image", str(tmp_path / "in.nii"), "--result", str(out_path),
        "--checkpoints_dir", str(tmp_path / "ck"), "--name", "parity",
        "--ngf", "4", "--ndf", "4", "--n_layers_D", "1",
        "--patch_size", "16", "16", "16",
        "--stride_inplane", str(STRIDE_INPLANE),
        "--stride_layer", str(STRIDE_LAYER),
        "--blend", "uniform", "--pad_mode", "reference",
        "--wire", "f32", "--precision", "float32"])
    ours = np.asarray(nifti.load(out_path).data, np.float32)

    want = reference_inference_math(vol, tg, PATCH, STRIDE_INPLANE,
                                    STRIDE_LAYER)
    assert ours.shape == want.shape == shape

    # The single recorded deviation: the reference adds +0.01 to every voxel
    # AFTER the overlap average (test.py:178); we do not. Verify the bias is
    # exactly that constant, then exact-match after removing it.
    bias = want - ours
    assert abs(float(np.mean(bias)) - 0.01) < 2e-3, float(np.mean(bias))
    np.testing.assert_allclose(ours, want - 0.01, atol=2e-2, rtol=0,
                               err_msg="decoded volumes diverge beyond the "
                                       "recorded +0.01 bias")
