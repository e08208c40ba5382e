#!/usr/bin/env python
"""Generate the InstructPix2Pix PROMPT dataset (the text stage).

TPU-framework counterpart of
models/instructpix2pix/dataset_creation/generate_txt_dataset.py (CLI
:106-113) and prepare_for_gpt.py. The reference prompts a fine-tuned GPT-3
over LAION-Aesthetics captions; that external paid API does not exist in a
zero-egress environment, so the completion backend is pluggable:

  --backend template   deterministic offline rule-based completions (default;
                       makes the prompts -> pairs -> training pipeline
                       runnable out of the box — see data/README.md)
  --backend openai     the reference's hosted completion endpoint, used only
                       if the `openai` package and OPENAI_API_KEY are
                       available (clear error otherwise)

Also exposes the fine-tune record transform:

  python runners/run_prompt_dataset.py prepare-for-gpt \
      --input_path human_examples.jsonl --output_path finetune.jsonl

Output .jsonl records are {"caption", "edit", "output"} — exactly what
runners/run_dataset_creation.py consumes.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd")

    g = sub.add_parser("generate", help="captions -> prompt dataset")
    g.add_argument("--captions_file", required=True,
                   help="one caption per line (.txt) or .jsonl with a "
                        '"caption"/"TEXT" field (+ optional "url"/"URL")')
    g.add_argument("--output_path", required=True)
    g.add_argument("--num_samples", type=int, default=10000)
    g.add_argument("--num_partitions", type=int, default=1)
    g.add_argument("--partition", type=int, default=0)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--backend", default="template",
                   choices=["template", "openai"])
    g.add_argument("--openai_model", default=None,
                   help="fine-tuned completion model id (openai backend)")

    f = sub.add_parser("prepare-for-gpt",
                       help="human {input,edit,output} examples -> "
                            "fine-tune {prompt,completion} records")
    f.add_argument("--input_path", required=True)
    f.add_argument("--output_path", required=True)
    return p


def _load_captions(path):
    captions, urls = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                rec = json.loads(line)
                captions.append(rec.get("caption") or rec.get("TEXT"))
                urls.append(rec.get("url") or rec.get("URL"))
            else:
                captions.append(line)
                urls.append(None)
    if all(u is None for u in urls):
        urls = None
    return captions, urls


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pnpinversion_tpu.training import prompt_dataset as pd

    if args.cmd == "prepare-for-gpt":
        with open(args.input_path) as f:
            records = [json.loads(l) for l in f if l.strip()]
        out = pd.prepare_for_gpt(records)
        with open(args.output_path, "w") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")
        print(f"wrote {len(out)} fine-tune records -> {args.output_path}")
        return

    if args.cmd != "generate":
        build_parser().error("choose a subcommand: generate | prepare-for-gpt")

    captions, urls = _load_captions(args.captions_file)
    idx = pd.partition_captions(len(captions), args.num_partitions,
                                args.partition, args.seed)
    captions = [captions[i] for i in idx]
    urls = [urls[i] for i in idx] if urls is not None else None

    if args.backend == "openai":
        try:
            import openai  # noqa: F401
        except ImportError as e:
            raise SystemExit(
                "--backend openai needs the `openai` package and "
                "OPENAI_API_KEY; use --backend template offline") from e
        if not _os.environ.get("OPENAI_API_KEY") or args.openai_model is None:
            raise SystemExit("--backend openai needs OPENAI_API_KEY and "
                             "--openai_model")
        openai.api_key = _os.environ["OPENAI_API_KEY"]

        def complete_fn(prompt):
            try:
                resp = openai.Completion.create(
                    model=args.openai_model, prompt=prompt, temperature=0.7,
                    max_tokens=256, top_p=1.0, frequency_penalty=0.1,
                    presence_penalty=0.0, stop=[pd.STOP])
                return resp["choices"][0]["text"]
            except Exception as e:  # retried on the next caption
                print(f"completion error: {e}")
                return None
    else:
        state = {"i": 0}

        def complete_fn(prompt):
            out = pd.template_complete(prompt, state["i"])
            state["i"] += 1
            return out

    n = pd.generate_prompt_dataset(captions, complete_fn, args.output_path,
                                   args.num_samples, urls=urls)
    print(f"{n} prompt records in {args.output_path}")


if __name__ == "__main__":
    main()
