"""Weight-converter mapping tests using fabricated torch-layout arrays."""
import numpy as np

from dgod_tpu.utils import weights as W


def test_resnet_body_mapping():
    sd = {
        "backbone.body.conv1.weight": np.random.rand(64, 3, 7, 7).astype(np.float32),
        "backbone.body.bn1.weight": np.random.rand(64).astype(np.float32),
        "backbone.body.bn1.running_mean": np.random.rand(64).astype(np.float32),
        "backbone.body.layer2.1.conv2.weight": np.random.rand(128, 128, 3, 3).astype(np.float32),
        "backbone.body.layer2.0.downsample.0.weight": np.random.rand(512, 256, 1, 1).astype(np.float32),
        "backbone.body.layer2.0.downsample.1.running_var": np.random.rand(512).astype(np.float32),
    }
    out = {}
    W._convert_resnet_body(sd, "backbone.body.", out, "backbone/body")
    body = out["backbone"]["body"]
    assert body["conv1"]["kernel"].shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(
        body["conv1"]["kernel"],
        np.transpose(sd["backbone.body.conv1.weight"], (2, 3, 1, 0)),
    )
    assert body["bn1"]["scale"].shape == (64,)
    assert body["bn1"]["mean"].shape == (64,)
    assert body["layer2_block1"]["Conv_1"]["kernel"].shape == (3, 3, 128, 128)
    assert body["layer2_block0"]["downsample_conv"]["kernel"].shape == (1, 1, 256, 512)
    assert body["layer2_block0"]["downsample_bn"]["var"].shape == (512,)


def test_fpn_mapping():
    sd = {
        "backbone.fpn.inner_blocks.0.weight": np.random.rand(256, 512, 1, 1).astype(np.float32),
        "backbone.fpn.inner_blocks.0.bias": np.random.rand(256).astype(np.float32),
        "backbone.fpn.layer_blocks.2.0.weight": np.random.rand(256, 256, 3, 3).astype(np.float32),
    }
    out = {}
    W._convert_fpn(sd, "backbone.fpn.", out, "backbone/fpn")
    fpn = out["backbone"]["fpn"]
    assert fpn["lateral0"]["kernel"].shape == (1, 1, 512, 256)
    assert fpn["output2"]["kernel"].shape == (3, 3, 256, 256)


def test_fc6_input_permutation():
    # fc6 torch weight [1024, 256*7*7] flattened CHW; ours expects HWC order
    w = np.arange(1024 * 12544, dtype=np.float32).reshape(1024, 12544) % 97
    sd = {"roi_heads.box_head.fc6.weight": w}
    out = W.convert_frcnn_state_dict(sd)
    k = out["box_head"]["fc6"]["kernel"]  # [12544, 1024]
    assert k.shape == (12544, 1024)
    # pick input position (y=2, x=3, c=5): torch index c*49 + y*7 + x
    x = np.zeros((256, 7, 7), np.float32)
    x[5, 2, 3] = 1.0
    torch_out = w @ x.reshape(-1)
    ours_out = k.T @ x.transpose(1, 2, 0).reshape(-1)
    np.testing.assert_allclose(torch_out, ours_out, rtol=1e-6)


def test_merge_into_counts_and_shape_guard():
    params = {"a": {"kernel": np.zeros((2, 2))}, "b": {"bias": np.zeros(3)}}
    n = W.merge_into(params, {"a": {"kernel": np.ones((2, 2))}})
    assert n == 1
    assert params["a"]["kernel"].sum() == 4
    try:
        W.merge_into(params, {"b": {"bias": np.zeros(4)}})
        raised = False
    except ValueError:
        raised = True
    assert raised
