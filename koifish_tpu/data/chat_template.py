"""Chat templating — ChatML rendering for prompts and SFT samples.

The reference embeds a minimal jinja engine to run the chat templates in
``tokenizer_config.json`` (src/TokenSet/jinja.hpp) and builds ChatML
samples for SFT (``Tokens2Samp_Chatml``, Dictionary.hpp:454). Here:
native ChatML / Qwen3 / GPT2-plain renderers plus a jinja2 passthrough
when the template and library are available.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

Message = Dict[str, str]

IM_START, IM_END = "<|im_start|>", "<|im_end|>"


def render_chatml(messages: Sequence[Message], add_generation_prompt: bool = True,
                  default_system: Optional[str] = None,
                  enable_thinking: bool = False) -> str:
    """Qwen-style ChatML."""
    out = []
    if default_system and not any(m["role"] == "system" for m in messages):
        out.append(f"{IM_START}system\n{default_system}{IM_END}\n")
    for m in messages:
        out.append(f"{IM_START}{m['role']}\n{m['content']}{IM_END}\n")
    if add_generation_prompt:
        out.append(f"{IM_START}assistant\n")
        if not enable_thinking:
            out.append("<think>\n\n</think>\n\n")
    return "".join(out)


def render_plain(messages: Sequence[Message], **_) -> str:
    """GPT2-style: plain concatenation."""
    return "\n".join(m["content"] for m in messages)


def load_hf_chat_template(model_dir: str) -> Optional[str]:
    cfg = os.path.join(model_dir, "tokenizer_config.json")
    if not os.path.exists(cfg):
        return None
    with open(cfg, encoding="utf-8") as f:
        return json.load(f).get("chat_template")


def render(messages: Sequence[Message], model_dir: Optional[str] = None,
           arch: str = "QWEN3", add_generation_prompt: bool = True,
           enable_thinking: bool = False) -> str:
    """Render messages with the model's own template when possible, else
    the arch-default renderer."""
    template = load_hf_chat_template(model_dir) if model_dir else None
    if template:
        try:
            import jinja2
            env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
            return env.from_string(template).render(
                messages=list(messages),
                add_generation_prompt=add_generation_prompt,
                enable_thinking=enable_thinking)
        except Exception:
            pass  # fall through to native renderer
    if arch.upper().startswith("GPT2"):
        return render_plain(messages)
    return render_chatml(messages, add_generation_prompt,
                         enable_thinking=enable_thinking)


def sft_sample_to_tokens(tokenizer, messages: Sequence[Message],
                         ) -> tuple[List[int], List[bool]]:
    """Render a conversation to (tokens, loss_mask) — loss only on
    assistant spans (the reference's SFT label masks,
    PreTokenizer.py ``build_sft_loss_labels``)."""
    tokens: List[int] = []
    mask: List[bool] = []
    for m in messages:
        head = tokenizer.encode(f"{IM_START}{m['role']}\n")
        body = tokenizer.encode(m["content"])
        tail = tokenizer.encode(f"{IM_END}\n")
        is_target = m["role"] == "assistant"
        tokens += head + body + tail
        mask += [False] * len(head) + [is_target] * len(body) + \
            [is_target] * len(tail)
    return tokens, mask
