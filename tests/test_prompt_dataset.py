"""Prompt-dataset stage (the reference's GPT-3 text stage).

Parity targets: generate_txt_dataset.py wire format/validation/resume and
prepare_for_gpt.py record transform; plus the committed sample's schema
compatibility with training.dataset_creation.load_prompts.
"""
import json
import os
import subprocess
import sys

from pnpinversion_tpu.training import prompt_dataset as pd
from pnpinversion_tpu.training.dataset_creation import load_prompts

REPO = os.path.join(os.path.dirname(__file__), os.pardir)


def test_prepare_for_gpt_format():
    recs = pd.prepare_for_gpt([
        {"input": "a cat", "edit": "make it a dog", "output": "a dog"}])
    assert recs == [{"prompt": "a cat\n##\n",
                     "completion": "make it a dog\n%%\na dog\nEND"}]


def test_parse_completion_roundtrip():
    text = pd.template_complete("a cat" + pd.DELIMITER_0, 0)
    edit, output = pd.parse_completion("a cat", text)
    assert edit and output and "a cat" in output


def test_parse_completion_rejects():
    # malformed (no delimiter), identical-output, and None completions
    assert pd.parse_completion("a cat", "no delimiter here") is None
    assert pd.parse_completion("A cat.", f"edit{pd.DELIMITER_1}a cat") is None
    assert pd.parse_completion("a cat", None) is None
    # multi-delimiter completions are malformed too
    assert pd.parse_completion(
        "a cat", f"e{pd.DELIMITER_1}x{pd.DELIMITER_1}y") is None


def test_generate_resume_and_dedup(tmp_path):
    out = str(tmp_path / "p.jsonl")
    caps = ["a cat", "a dog", "a cat", "a boat"]

    def complete(prompt):
        return pd.template_complete(prompt, 0)

    n = pd.generate_prompt_dataset(caps, complete, out, num_samples=2)
    assert n == 2
    # resume: duplicate captions skipped, count continues from the file
    n = pd.generate_prompt_dataset(caps, complete, out, num_samples=4)
    assert n == 3  # only "a boat" is new ("a cat" duped in the input)
    recs = load_prompts(out)
    assert [r["caption"] for r in recs] == ["a cat", "a dog", "a boat"]
    assert all(set(r) == {"caption", "edit", "output"} for r in recs)


def test_moderation_gate(tmp_path):
    out = str(tmp_path / "p.jsonl")
    n = pd.generate_prompt_dataset(
        ["bad caption", "good caption"],
        lambda p: pd.template_complete(p, 0), out, num_samples=2,
        moderation_fn=lambda s: "bad" in s)
    assert n == 1


def test_partition_split_is_disjoint_and_total():
    parts = [pd.partition_captions(10, 3, i, seed=0) for i in range(3)]
    flat = sorted(int(x) for p in parts for x in p)
    assert flat == list(range(10))


def test_sample_prompts_schema():
    recs = load_prompts(os.path.join(REPO, "data", "sample_prompts.jsonl"))
    assert len(recs) >= 5
    for r in recs:
        assert r["caption"] and r["edit"] and r["output"]
        assert r["caption"] != r["output"]


def test_runner_cli(tmp_path):
    caps = tmp_path / "caps.txt"
    caps.write_text("a castle on a hill\na cat on a windowsill\n")
    out = tmp_path / "prompts.jsonl"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "runners", "run_prompt_dataset.py"),
         "generate", "--captions_file", str(caps), "--output_path", str(out),
         "--num_samples", "2"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert len(load_prompts(str(out))) == 2

    # prepare-for-gpt subcommand
    human = tmp_path / "human.jsonl"
    human.write_text(json.dumps(
        {"input": "a cat", "edit": "make it a dog", "output": "a dog"}) + "\n")
    ft = tmp_path / "ft.jsonl"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "runners", "run_prompt_dataset.py"),
         "prepare-for-gpt", "--input_path", str(human),
         "--output_path", str(ft)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    rec = json.loads(ft.read_text())
    assert rec["completion"].endswith(pd.STOP)
