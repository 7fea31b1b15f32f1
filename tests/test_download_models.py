"""download_models against a local file:// mirror (the zero-egress stand-in
for the reference's GCS fetch, download_model.py:10-27)."""

import os

from pepper_tpu.cli.main import main as variant_main
from pepper_tpu.cli.polish_main import main as polish_main
from pepper_tpu.utils.download_model import download_models


def _make_mirror(tmp_path):
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    (mirror / "PEPPER_VARIANT_ONT.pkl").write_bytes(b"fake-model-1")
    (mirror / "PEPPER_POLISH.pkl").write_bytes(b"fake-model-2" * 100)
    desc = mirror / "pepper_model_description.csv"
    desc.write_text(
        f"PEPPER_VARIANT_ONT,file://{mirror}/PEPPER_VARIANT_ONT.pkl\n"
        f"PEPPER_POLISH,file://{mirror}/PEPPER_POLISH.pkl\n")
    return f"file://{desc}"


def test_download_models_file_mirror(tmp_path):
    url = _make_mirror(tmp_path)
    out = tmp_path / "models"
    paths = download_models(str(out), url)
    assert len(paths) == 2
    assert (out / "PEPPER_VARIANT_ONT.pkl").read_bytes() == b"fake-model-1"
    assert (out / "PEPPER_POLISH.pkl").read_bytes() == b"fake-model-2" * 100
    # second run: both exist -> skipped, still reported
    paths2 = download_models(str(out), url)
    assert sorted(paths2) == sorted(paths)
    assert not any(p.endswith(".part") for p in os.listdir(out))


def test_download_models_cli(tmp_path, capsys):
    url = _make_mirror(tmp_path)
    out = tmp_path / "cli_models"
    rc = variant_main(["download_models", "-o", str(out),
                       "--description_url", url])
    assert rc == 0
    assert (out / "PEPPER_VARIANT_ONT.pkl").exists()
    assert "2 model(s)" in capsys.readouterr().out

    out2 = tmp_path / "cli_models_polish"
    rc = polish_main(["download_models", "-o", str(out2),
                      "--description_url", url])
    assert rc == 0
    assert (out2 / "PEPPER_POLISH.pkl").exists()


def test_download_models_offline_fails_cleanly(tmp_path):
    rc = variant_main([
        "download_models", "-o", str(tmp_path / "x"),
        "--description_url", f"file://{tmp_path}/does_not_exist.csv"])
    assert rc == 1
