"""Hub push plumbing (utils/hub.py; reference train:382-387, 931-939).

Zero-egress container: the HfApi surface is faked — these tests pin the call
contract (create_repo exist_ok, upload_folder ignore patterns), not the network.
"""

import sys
import types

from controllora_tpu.utils import hub


class _FakeRepo:
    def __init__(self, repo_id):
        self.repo_id = repo_id


class _FakeApi:
    calls = []

    def __init__(self, token=None):
        _FakeApi.calls.append(("init", token))

    def create_repo(self, repo_id, exist_ok=False, private=False):
        _FakeApi.calls.append(("create_repo", repo_id, exist_ok, private))
        return _FakeRepo(f"user/{repo_id}")

    def upload_folder(self, folder_path, repo_id, commit_message, ignore_patterns):
        _FakeApi.calls.append(
            ("upload_folder", folder_path, repo_id, commit_message, tuple(ignore_patterns))
        )


def test_push_to_hub_contract(tmp_path, monkeypatch):
    _FakeApi.calls = []
    fake = types.ModuleType("huggingface_hub")
    fake.HfApi = _FakeApi
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    out = tmp_path / "my-control-lora"
    out.mkdir()
    (out / "diffusion_pytorch_model.safetensors").write_bytes(b"x")

    url = hub.push_to_hub(str(out), token="tok")
    assert url == "https://huggingface.co/user/my-control-lora"
    kinds = [c[0] for c in _FakeApi.calls]
    assert kinds == ["init", "create_repo", "upload_folder"]
    assert _FakeApi.calls[1][2] is True  # exist_ok
    up = _FakeApi.calls[2]
    assert up[1] == str(out)
    # reference ignores intermediate checkpoints on push (train:934-938)
    assert "step_*" in up[4] and "checkpoint-*" in up[4]


def test_push_to_hub_explicit_repo_id(tmp_path, monkeypatch):
    _FakeApi.calls = []
    fake = types.ModuleType("huggingface_hub")
    fake.HfApi = _FakeApi
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    out = tmp_path / "run"
    out.mkdir()
    hub.push_to_hub(str(out), repo_id="org/name")
    assert _FakeApi.calls[1][1] == "org/name"
