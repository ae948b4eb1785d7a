"""Interactive chat CLI (parity: python/chat_with_bot.py).

Commands (same set as the reference, chat_with_bot.py:154-236):
  +reset            reset chat
  +gen TEXT         free single-round generation with any prompt
  +i INSTRUCT       instruct-style generation
  +qa QUESTION      answer independent of chat context
  +qq QUESTION      creative answer independent of context
  +++               continue last free generation
  ++                retry last free generation
  +                 alternate chat reply
Named conversation state snapshots implement save/fork/restore by copying the
externalized state (the reference does the same with its FP32 buffer,
chat_with_bot.py:80-96).

Usage: python -m rwkv_tpu.tools.chat MODEL.bin [tokenizer] [--prompt-json FILE]
"""

import argparse
import json

import numpy as np

import jax

from rwkv_tpu.runtime.context import Context
from rwkv_tpu.utils.sampling import sample_logits
from rwkv_tpu.utils.tokenizer import get_tokenizer

MAX_GENERATION_LENGTH = 250
TEMPERATURE = 0.8
TOP_P = 0.5
PRESENCE_PENALTY = 0.2
FREQUENCY_PENALTY = 0.2
END_OF_LINE_TOKEN = 187        # 20B tokenizer '\n'
DOUBLE_END_OF_LINE_TOKEN = 535  # 20B tokenizer '\n\n'
END_OF_TEXT_TOKEN = 0

DEFAULT_PROMPT = {
    "user": "Bob",
    "assistant": "Alice",
    "separator": ":",
    "prompt": (
        "\nThe following is a coherent verbose detailed conversation between a girl "
        "named Alice and her friend Bob. Alice is very intelligent, creative and "
        "friendly. Alice is unlikely to disagree with Bob, and Alice doesn't like "
        "to ask Bob questions. Alice likes to tell Bob a lot about herself and her "
        "opinions. Alice usually gives Bob kind, helpful and informative advices."
        "\n\nBob: Hello Alice, how are you doing?\n\nAlice: Hi! Thanks, I'm fine. "
        "What about you?\n\nBob: I am fine. It's nice to see you. Look, here is a "
        "store selling tea and juice.\n\nAlice: Sure. Let's go inside. What would "
        "you like to have?\n\nBob: I would like a cup of black tea, please.\n\n"
        "Alice: Sounds great. I'll have the same. Here you are.\n\n"
    ),
}


def main():
    ap = argparse.ArgumentParser(description="Chat with an RWKV model")
    ap.add_argument("model_path")
    ap.add_argument("tokenizer", nargs="?", default="auto")
    ap.add_argument("--prompt-json", help="JSON with user/assistant/separator/prompt keys")
    ap.add_argument("--language", default="English",
                    choices=["English", "Chinese", "Japanese"],
                    help="packaged prompt preset language (chat_with_bot.py:18-38)")
    ap.add_argument("--prompt-type", default="Chat", choices=["Chat", "QA"],
                    help="packaged prompt preset style")
    args = ap.parse_args()

    if args.prompt_json:
        pdata = json.load(open(args.prompt_json, encoding="utf-8"))
    else:
        import os

        preset = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "prompts", f"{args.language}-{args.prompt_type}.json",
        )
        if os.path.exists(preset):
            pdata = json.load(open(preset, encoding="utf-8"))
        else:
            pdata = DEFAULT_PROMPT
    user, assistant, separator = pdata["user"], pdata["assistant"], pdata["separator"]
    init_prompt = pdata["prompt"]

    ctx = Context(args.model_path)
    decode, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)
    is_20b = ctx.n_vocab == 50277

    def split_last_end_of_line(tokens):
        # model saw '\n\n' as [187,187]; tokenizer emits [535] at the end
        if is_20b and tokens and tokens[-1] == DOUBLE_END_OF_LINE_TOKEN:
            return tokens[:-1] + [END_OF_LINE_TOKEN, END_OF_LINE_TOKEN]
        return tokens

    state = {"logits": None, "state": None, "tokens": []}
    threads = {}

    def process_tokens(tokens, new_line_logit_bias=0.0):
        tokens = split_last_end_of_line(tokens)
        if not tokens:
            return
        state["tokens"] = state["tokens"] + tokens
        logits, st = ctx.eval_sequence_in_chunks(tokens, 16, state["state"])
        logits = np.asarray(logits).copy()
        logits[END_OF_LINE_TOKEN if is_20b else 11] += new_line_logit_bias
        state["logits"], state["state"] = logits, st

    def save_thread(name):
        threads[name] = {
            "tokens": list(state["tokens"]),
            "logits": None if state["logits"] is None else state["logits"].copy(),
            "state": None if state["state"] is None else jax.tree.map(lambda x: x, state["state"]),
        }

    def load_thread(name):
        t = threads[name]
        state["tokens"] = list(t["tokens"])
        state["logits"] = None if t["logits"] is None else t["logits"].copy()
        state["state"] = t["state"]

    print("Processing the initial prompt...")
    process_tokens(encode(init_prompt))
    save_thread("chat_init")
    save_thread("chat")
    print(f"Chat initialized! Talk to {assistant} (commands: +reset +gen +i "
          f"+qa +qq +++ ++ + +save FILE +load FILE)")

    while True:
        try:
            msg = input(f"> {user}{separator} ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            break
        if not msg:
            continue
        temperature, top_p = TEMPERATURE, TOP_P

        if msg == "+reset":
            load_thread("chat_init")
            save_thread("chat")
            print(f"{assistant}{separator} Chat reset.\n")
            continue

        # session persistence (beyond-reference): the whole conversation is
        # the O(1) state buffer (byte-compatible with the reference's
        # rwkv_get_state layout), so a chat saves/loads as one .npz
        if msg[:6].lower() == "+save " or msg[:6].lower() == "+load ":
            path = msg[6:].strip()
            try:
                if msg[:6].lower() == "+save ":
                    np.savez(path,
                             tokens=np.asarray(state["tokens"], np.int64),
                             logits=np.asarray(state["logits"], np.float32),
                             state=ctx.state_to_buffer(state["state"]))
                    print(f"{assistant}{separator} Session saved to {path}\n")
                else:
                    data = np.load(path if path.endswith(".npz") else path + ".npz")
                    state["tokens"] = [int(t) for t in data["tokens"]]
                    state["logits"] = data["logits"].astype(np.float32)
                    state["state"] = ctx.state_from_buffer(data["state"])
                    save_thread("chat")
                    print(f"{assistant}{separator} Session loaded from {path} "
                          f"({len(state['tokens'])} tokens of context)\n")
            except Exception as e:
                print(f"{assistant}{separator} Session {msg[1:5]} failed: {e}\n")
            continue

        if (
            msg[:5].lower() == "+gen " or msg[:3].lower() == "+i " or
            msg[:4].lower() == "+qa " or msg[:4].lower() == "+qq " or
            msg.lower() in ("+++", "++")
        ):
            if msg[:5].lower() == "+gen ":
                state.update(logits=None, state=None, tokens=[])
                process_tokens(encode("\n" + msg[5:].strip()))
                save_thread("gen_0")
            elif msg[:3].lower() == "+i ":
                instruct = (
                    "\nBelow is an instruction that describes a task. Write a response "
                    "that appropriately completes the request.\n\n# Instruction:\n"
                    f"{msg[3:].strip()}\n\n# Response:\n"
                )
                state.update(logits=None, state=None, tokens=[])
                process_tokens(encode(instruct))
                save_thread("gen_0")
            elif msg[:4].lower() == "+qq ":
                state.update(logits=None, state=None, tokens=[])
                process_tokens(encode("\nQ: " + msg[4:].strip() + "\nA:"))
                save_thread("gen_0")
            elif msg[:4].lower() == "+qa ":
                load_thread("chat_init")
                process_tokens(encode(f"{user}{separator} {msg[4:].strip()}\n\n{assistant}{separator}"))
                save_thread("gen_0")
            elif msg.lower() == "+++":
                if "gen_1" not in threads:
                    print("No generation to continue")
                    continue
                load_thread("gen_1")
                save_thread("gen_0")
            elif msg.lower() == "++":
                if "gen_0" not in threads:
                    print("No generation to retry")
                    continue
                load_thread("gen_0")
            thread = "gen_1"
        else:
            if msg == "+":
                if "chat_pre" not in threads:
                    print("No reply to alternate")
                    continue
                load_thread("chat_pre")
            else:
                load_thread("chat")
                process_tokens(
                    encode(f"{user}{separator} {msg}\n\n{assistant}{separator}"),
                    new_line_logit_bias=-999999999,
                )
                save_thread("chat_pre")
            thread = "chat"
            print(f"> {assistant}{separator}", end="")

        accumulated = []
        token_counts = {}
        for _ in range(MAX_GENERATION_LENGTH):
            logits = state["logits"].copy()
            for tok, cnt in token_counts.items():
                logits[tok] -= PRESENCE_PENALTY + cnt * FREQUENCY_PENALTY
            token = sample_logits(logits, temperature, top_p)
            if token == END_OF_TEXT_TOKEN:
                print()
                break
            token_counts[token] = token_counts.get(token, 0) + 1
            process_tokens([token])
            accumulated.append(token)
            text = decode(accumulated)
            if "�" not in text:  # defer partial UTF-8 (tokenizer contract)
                print(text, end="", flush=True)
                accumulated = []
            if thread == "chat" and decode(state["tokens"][-2:]).endswith("\n\n"):
                print()
                break
        save_thread(thread)


if __name__ == "__main__":
    main()
