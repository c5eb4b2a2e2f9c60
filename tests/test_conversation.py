"""Conversation template rendering vs reference formats (`conversation.py:40-124`)."""

from metamorph_tpu.multimodal.conversation import (Conversation, SeparatorStyle,
                                                   conv_llama_3, conv_templates,
                                                   conv_vicuna_v0)


def test_llama3_prompt():
    conv = conv_llama_3.copy()
    conv.append_message(conv.roles[0], "hello")
    conv.append_message(conv.roles[1], "hi")
    out = conv.get_prompt()
    assert out == ("<|begin_of_text|>"
                   "<|start_header_id|>user<|end_header_id|>\nhello<|eot_id|>"
                   "<|start_header_id|>assistant<|end_header_id|>\nhi<|eot_id|>")


def test_llama3_open_turn():
    conv = conv_llama_3.copy()
    conv.append_message(conv.roles[0], "q")
    conv.append_message(conv.roles[1], None)
    out = conv.get_prompt()
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n")
    assert "<|eot_id|>" in out


def test_single_style():
    conv = conv_vicuna_v0.copy()
    conv.append_message("Human", "a")
    conv.append_message("Assistant", "b")
    out = conv.get_prompt()
    assert "Human: a###" in out and "Assistant: b###" in out
    assert out.startswith(conv.system + "###")


def test_two_style():
    conv = Conversation(system="SYS", roles=("USER", "ASSISTANT"), messages=[],
                        offset=0, sep_style=SeparatorStyle.TWO, sep=" ",
                        sep2="</s>")
    conv.append_message("USER", "q")
    conv.append_message("ASSISTANT", "a")
    assert conv.get_prompt() == "SYS USER: q ASSISTANT: a</s>"


def test_llama2_style():
    conv = Conversation(system="S", roles=("USER", "ASSISTANT"), messages=[],
                        offset=0, sep_style=SeparatorStyle.LLAMA_2,
                        sep="<s>", sep2="</s>")
    conv.append_message("USER", "q")
    conv.append_message("ASSISTANT", "a")
    out = conv.get_prompt()
    assert "[INST] <<SYS>>\nS\n<</SYS>>\n\nq [/INST]" in out
    assert out.endswith(" a </s>")


def test_registry_and_copy_isolation():
    assert conv_templates["llama3"] is conv_llama_3
    c1 = conv_llama_3.copy()
    c1.append_message(c1.roles[0], "x")
    assert conv_llama_3.messages == []  # template untouched


def test_image_tuple_message():
    conv = conv_llama_3.copy()
    conv.append_message(conv.roles[0], ("<image> describe", None, "Default"))
    conv.append_message(conv.roles[1], "ok")
    out = conv.get_prompt()
    assert "<image>\ndescribe" in out


def test_registry_covers_masking_templates():
    """v1 / vicuna_v1 / llama_2 are registered (the reference's train.py:1487-1490
    selects templates by name and falls back to "vicuna_v1") and render the
    formats the masking preprocessors rely on."""
    for name in ("v1", "vicuna_v1", "llama_2", "plain", "llama3"):
        assert name in conv_templates, name
    assert conv_templates["v1"] is conv_templates["vicuna_v1"]

    v1 = conv_templates["v1"].copy()
    v1.append_message(v1.roles[0], "q")
    v1.append_message(v1.roles[1], "a")
    out = v1.get_prompt()
    assert "USER: q ASSISTANT: a</s>" in out

    l2 = conv_templates["llama_2"].copy()
    l2.append_message(l2.roles[0], "q")
    l2.append_message(l2.roles[1], "a")
    out = l2.get_prompt()
    assert "[INST] q [/INST]" in out and out.endswith(" a </s>")


def test_process_image_and_get_images():
    import numpy as np

    conv = conv_llama_3.copy()
    img = np.full((20, 40, 3), 50, np.uint8)
    conv.append_message(conv.roles[0], ("<image> what", img, "Pad"))
    conv.append_message(conv.roles[1], "a thing")

    imgs = conv.get_images(return_pil=True)
    assert len(imgs) == 1
    assert imgs[0].shape == (40, 40, 3)  # padded square
    # padding rows carry the reference background color
    assert tuple(imgs[0][0, 0]) == (122, 116, 104)

    b64 = conv.get_images(return_pil=False)[0]
    assert isinstance(b64, str) and len(b64) > 10

    resized = conv.process_image(img, "Resize", return_pil=True)
    assert resized.shape == (336, 336, 3)

    big = np.zeros((2800, 1400, 3), np.uint8)
    capped = conv.process_image(big, "Default", return_pil=True)
    assert max(capped.shape[:2]) <= 1344

    chat = conv.to_gradio_chatbot()
    assert len(chat) == 1
    assert chat[0][0].startswith('<img src="data:image/jpeg;base64,')
    assert chat[0][1] == "a thing"

    d = conv.dict()
    assert d["messages"][0][1] == "<image> what"  # tuple reduced to text
