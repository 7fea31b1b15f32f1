"""Torch-parity tests for the alternate (experimental) model families
(SURVEY.md §2.2/§2.3: simple_model_no_cnn.py, simple_model_transformers.py,
pepper resnet.py, Seq2Seq_atn.py).  Each test builds an equivalently-shaped
torch model following the reference architecture, converts its weights, and
checks the JAX forward matches."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pepper_tpu.models.alternates import (  # noqa: E402
    NoCnnConfig,
    Seq2SeqConfig,
    TransformerConfig,
    init_no_cnn_params,
    init_seq2seq_params,
    init_transformer_params,
    no_cnn_apply,
    no_cnn_params_from_state_dict,
    resnet_apply,
    resnet_params_from_state_dict,
    seq2seq_decode_step,
    seq2seq_encode,
    seq2seq_params_from_state_dict,
    transformer_apply,
    transformer_params_from_state_dict,
)


# ---------------------------------------------------------------------------
# torch models mirroring the reference architectures
# ---------------------------------------------------------------------------


class TorchNoCnn(nn.Module):
    """simple_model_no_cnn.py:5-97: narrower biLSTM pair where the decoder
    re-reads the input with the encoder's final state."""

    def __init__(self, features=26, window=33, hidden=128):
        super().__init__()
        self.encoder = nn.LSTM(features, hidden, bidirectional=True,
                               batch_first=True)
        self.decoder = nn.LSTM(features, hidden, bidirectional=True,
                               batch_first=True)
        sizes = (2 * hidden * window, 256, 128, 64, 32, 16)
        for i in range(5):
            setattr(self, f"linear_{i + 1}", nn.Linear(sizes[i], sizes[i + 1]))
        self.output_layer = nn.Linear(16, 3)

    def forward(self, x):
        _, (hidden, cell) = self.encoder(x)
        x, _ = self.decoder(x, (hidden, cell))
        x = torch.flatten(x, 1, 2)
        for i in range(1, 6):
            x = F.relu(getattr(self, f"linear_{i}")(x))
        return torch.softmax(self.output_layer(x), dim=1)


class TorchTransformer(nn.Module):
    """simple_model_transformers.py:5-90 (2 encoder layers for test speed)."""

    def __init__(self, features=26, window=33, channels=4, layers=2):
        super().__init__()
        self.conv1 = nn.Conv2d(1, channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(channels)
        self.conv2 = nn.Conv2d(channels, channels, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(channels)
        layer = nn.TransformerEncoderLayer(d_model=channels * features,
                                           nhead=8, batch_first=True)
        self.encoder = nn.TransformerEncoder(layer, num_layers=layers)
        sizes = (channels * features * window, 128, 64, 32, 16, 8)
        for i in range(5):
            setattr(self, f"linear_{i + 1}", nn.Linear(sizes[i], sizes[i + 1]))
        self.output_layer = nn.Linear(8, 3)

    def forward(self, x):
        x = torch.reshape(x, (x.size()[0], 1, x.size()[1], x.size()[2]))
        residual = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = F.relu(out + residual)
        out = torch.reshape(out, (out.size()[0], out.size()[2],
                                  out.size()[1] * out.size()[3]))
        out = self.encoder(out)
        out = torch.flatten(out, 1, 2)
        for i in range(1, 6):
            out = F.relu(getattr(self, f"linear_{i}")(out))
        return torch.softmax(self.output_layer(out), dim=1)


class TorchBasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchResNet(nn.Module):
    """resnet.py:49-94 (the dead `downsample` Sequential is not registered
    by the reference's BasicBlock either)."""

    def __init__(self):
        super().__init__()
        self.Context_Conv2d_0a = TorchBasicConv2d(1, 1, kernel_size=(1, 4),
                                                  stride=(1, 4))
        self.Context_Conv2d_1a = TorchBasicConv2d(1, 1, kernel_size=(1, 1))
        block = nn.Module()
        block.conv1 = nn.Conv2d(1, 1, 3, padding=1, bias=False)
        block.bn1 = nn.BatchNorm2d(1)
        block.conv2 = nn.Conv2d(1, 1, 3, padding=1, bias=False)
        block.bn2 = nn.BatchNorm2d(1)
        self.layer1 = nn.ModuleList([block])

    def forward(self, x):
        x = self.Context_Conv2d_0a(x)
        x = self.Context_Conv2d_1a(x)
        block = self.layer1[0]
        residual = x
        out = F.relu(block.bn1(block.conv1(x)))
        out = block.bn2(block.conv2(out))
        return F.relu(out + residual)


class TorchSeq2Seq(nn.Module):
    """EncoderCRNN + AttnDecoderRNN (Seq2Seq_atn.py:62-135) with the CNN
    front end and direction-summed bidirectional GRUs."""

    def __init__(self, hidden=32, num_classes=5):
        super().__init__()
        encoder = nn.Module()
        encoder.cnn_encoder = nn.Module()
        encoder.cnn_encoder.cnn = TorchResNet()
        encoder.gru = nn.GRU(5, hidden, bidirectional=True, batch_first=True)
        self.encoder = encoder
        decoder = nn.Module()
        decoder.gru = nn.GRU(num_classes, hidden, bidirectional=True,
                             batch_first=True)
        decoder.attention = nn.Module()
        decoder.attention.linear_out = nn.Linear(2 * hidden, hidden)
        decoder.out = nn.Linear(hidden, num_classes)
        self.decoder = decoder
        self.hidden = hidden

    def encode(self, images):
        feats = self.encoder.cnn_encoder.cnn(images)
        B, _, T, Fp = feats.shape
        feats = feats.view(B, T, -1)
        out, hidden = self.encoder.gru(feats)
        out = out.view(B, T, 2, -1).sum(2)
        return out, hidden

    def decode_step(self, onehot, context, hidden):
        out, hidden = self.decoder.gru(onehot.unsqueeze(1), hidden)
        out = out.view(out.size(0), 1, 2, -1).sum(2)
        attn = torch.bmm(out, context.transpose(1, 2))
        attn = F.softmax(attn.view(-1, context.size(1)), dim=1).view(
            out.size(0), -1, context.size(1))
        mix = torch.bmm(attn, context)
        combined = torch.cat((mix, out), dim=2)
        out = torch.tanh(self.decoder.attention.linear_out(
            combined.view(-1, 2 * self.hidden))).view(out.size(0), -1,
                                                      self.hidden)
        return self.decoder.out(out[:, 0, :]), hidden


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_no_cnn_matches_torch():
    torch.manual_seed(1)
    model = TorchNoCnn().eval()
    params = no_cnn_params_from_state_dict(model.state_dict())
    x = np.random.default_rng(0).normal(size=(3, 33, 26)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(no_cnn_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_no_cnn_init_shapes():
    params = init_no_cnn_params(jax.random.PRNGKey(0))
    probs = no_cnn_apply(params, jnp.zeros((2, 33, 26)))
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, atol=1e-5)


def test_transformer_matches_torch():
    torch.manual_seed(2)
    model = TorchTransformer().eval()
    # make the BN running stats non-trivial before eval
    model.train()
    with torch.no_grad():
        model(torch.randn(8, 33, 26))
    model.eval()
    params = transformer_params_from_state_dict(model.state_dict())
    x = np.random.default_rng(1).normal(size=(2, 33, 26)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(transformer_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_transformer_init_shapes():
    config = TransformerConfig(num_layers=2, ffn_size=128)
    params = init_transformer_params(jax.random.PRNGKey(0), config)
    logits = transformer_apply(params, jnp.zeros((2, 33, 26)), config=config,
                               train=True)
    assert logits.shape == (2, 3)


def test_resnet_matches_torch():
    torch.manual_seed(3)
    model = TorchResNet()
    model.train()
    with torch.no_grad():
        model(torch.randn(4, 1, 16, 20))
    model.eval()
    params = resnet_params_from_state_dict(model.state_dict())
    x = np.random.default_rng(2).normal(size=(2, 1, 16, 20)).astype(
        np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(resnet_apply(params, jnp.asarray(x)))
    assert got.shape == (2, 1, 16, 5)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_seq2seq_matches_torch():
    torch.manual_seed(4)
    model = TorchSeq2Seq()
    model.train()
    with torch.no_grad():
        model.encode(torch.randn(4, 1, 16, 20))
    model.eval()
    params = seq2seq_params_from_state_dict(model.state_dict())

    rng = np.random.default_rng(3)
    images = rng.normal(size=(2, 1, 16, 20)).astype(np.float32)
    with torch.no_grad():
        want_ctx, want_hidden = model.encode(torch.from_numpy(images))
    ctx, hidden = seq2seq_encode(params, jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(ctx), want_ctx.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden[0]),
                               want_hidden[0].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden[1]),
                               want_hidden[1].numpy(), atol=2e-5)

    onehot = np.eye(5, dtype=np.float32)[rng.integers(0, 5, size=2)]
    with torch.no_grad():
        want_logits, want_h2 = model.decode_step(
            torch.from_numpy(onehot), want_ctx, want_hidden)
    logits, h2, attn = seq2seq_decode_step(params, jnp.asarray(onehot), ctx,
                                           hidden)
    np.testing.assert_allclose(np.asarray(logits), want_logits.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(h2[0]), want_h2[0].numpy(),
                               atol=2e-5)
    assert attn.shape == (2, 1, 16)


def test_seq2seq_init_shapes():
    config = Seq2SeqConfig(hidden=16)
    params = init_seq2seq_params(jax.random.PRNGKey(0), config)
    ctx, hidden = seq2seq_encode(params, jnp.zeros((2, 1, 12, 20)))
    assert ctx.shape == (2, 12, 16)
    logits, hidden, _ = seq2seq_decode_step(
        params, jnp.eye(5)[jnp.array([0, 3])], ctx, hidden)
    assert logits.shape == (2, 5)
