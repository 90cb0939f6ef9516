"""Shim for `gradio` (not installed). The reference imports it in
utils/parse.py:8 solely for `gr.Error` (parse.py:12, raised on unparseable
LLM responses in the WebUI context)."""


class Error(Exception):
    pass
