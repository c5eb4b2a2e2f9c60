"""Conversation prompt templating.

Parity with `metamorph/conversation.py:15-290`: same separator styles, same
template registry, LLaMA-3 header format as the default. Templates are pure
data + a `render()` function (no torch / PIL dependencies in the hot path).
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import List, Optional, Sequence, Tuple


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()
    MPT = auto()
    PLAIN = auto()
    LLAMA_2 = auto()
    LLAMA_3 = auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"

    def get_prompt(self) -> str:
        messages = self.messages
        if messages and isinstance(messages[0][1], tuple):
            # (msg, image, mode) tuples from demo flows: ensure "<image>\n" prefix
            messages = [list(m) for m in self.messages]
            role, payload = messages[0]
            msg = payload[0].replace("<image>", "").strip()
            messages[0] = [role, "<image>\n" + msg]

        style = self.sep_style
        if style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    ret += role + ": " + _text(message) + self.sep
                else:
                    ret += role + ":"
            return ret
        if style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    ret += role + ": " + _text(message) + seps[i % 2]
                else:
                    ret += role + ":"
            return ret
        if style in (SeparatorStyle.MPT, SeparatorStyle.LLAMA_3):
            ret = self.system if style == SeparatorStyle.LLAMA_3 else self.system + self.sep
            if style == SeparatorStyle.MPT:
                for role, message in messages:
                    ret += role + (_text(message) + self.sep if message else "")
                return ret
            for role, message in messages:
                ret += role + (_text(message) + self.sep if message else "")
            return ret
        if style == SeparatorStyle.LLAMA_2:
            def wrap_sys(msg):
                return f"<<SYS>>\n{msg}\n<</SYS>>\n\n" if msg else msg

            def wrap_inst(msg):
                return f"[INST] {msg} [/INST]"

            ret = ""
            for i, (role, message) in enumerate(messages):
                if message:
                    msg = _text(message)
                    if i == 0:
                        msg = wrap_sys(self.system) + msg
                    if i % 2 == 0:
                        ret += self.sep + wrap_inst(msg)
                    else:
                        ret += " " + msg + " " + self.sep2
            return ret.lstrip(self.sep)
        if style == SeparatorStyle.PLAIN:
            ret = self.system + self.sep
            for role, message in messages:
                ret += role + (_text(message) + self.sep if message else "")
            return ret
        raise ValueError(f"Invalid style: {style}")

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system, roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset, sep_style=self.sep_style,
            sep=self.sep, sep2=self.sep2, version=self.version)


def _text(message):
    return message[0] if isinstance(message, tuple) else message


conv_vicuna_v0 = Conversation(
    system="A chat between a curious human and an artificial intelligence assistant. "
           "The assistant gives helpful, detailed, and polite answers to the human's questions.",
    roles=("Human", "Assistant"),
    messages=[],
    offset=2,
    sep_style=SeparatorStyle.SINGLE,
    sep="###",
    version="v0",
)

conv_chatml_direct = Conversation(
    system="",
    roles=("<|im_start|>user\n", "<|im_start|>assistant\n"),
    version="mpt",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MPT,
    sep="<|im_end|>",
)

conv_llama_3 = Conversation(
    system="<|begin_of_text|>",
    roles=("<|start_header_id|>user<|end_header_id|>\n",
           "<|start_header_id|>assistant<|end_header_id|>\n"),
    version="llama3",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_3,
    sep="<|eot_id|>",
)

conv_plain = Conversation(
    system="",
    roles=("", ""),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    version="plain",
)

conv_vicuna_v1 = Conversation(
    system="A chat between a curious user and an artificial intelligence "
           "assistant. The assistant gives helpful, detailed, and polite "
           "answers to the user's questions.",
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1",
)

conv_llama_2 = Conversation(
    system="",
    roles=("USER", "ASSISTANT"),
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.LLAMA_2,
    sep="<s>",
    sep2="</s>",
    version="llama_v2",
)

default_conversation = conv_llama_3

# Registry mirrors `conversation.py:283-290`, plus the v1/llama_2 templates the
# masking preprocessors (`train.py:335-499`) consume — the reference selects
# them via `model_args.version` (`train.py:1487-1490`) but ships a registry
# that would KeyError on the "vicuna_v1" fallback; we register them properly.
conv_templates = {
    "default": conv_vicuna_v0,
    "v0": conv_vicuna_v0,
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llama_2": conv_llama_2,
    "llama3": conv_llama_3,
    "chatml_direct": conv_chatml_direct,
    "mistral_direct": conv_chatml_direct,
    "plain": conv_plain,
}
