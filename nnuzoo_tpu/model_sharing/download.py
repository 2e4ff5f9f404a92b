"""Pretrained-model download (reference: `nnunetv2/model_sharing/model_download.py`).
urllib-based (no requests dependency); fails gracefully in zero-egress
environments."""

import os
import tempfile
import urllib.request

from .model_export import install_model_from_zip_file


def download_and_install_from_url(url: str) -> None:
    print(f"Downloading {url} ...")
    tmp = tempfile.NamedTemporaryFile(suffix=".zip", delete=False)
    try:
        with urllib.request.urlopen(url, timeout=60) as resp, \
                open(tmp.name, "wb") as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        install_model_from_zip_file(tmp.name)
    except OSError as e:
        raise RuntimeError(
            f"Could not download {url} ({e}). If this environment has no network "
            f"access, transfer the zip manually and run "
            f"nnUNetv2_install_pretrained_model_from_zip.") from e
    finally:
        os.unlink(tmp.name)
