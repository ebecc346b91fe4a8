"""Prompt extension / expansion.

Parity target: reference `wan/utils/prompt_extend.py` (DashScope API +
local Qwen-VL expanders; optional nicety, not wired into the shipped CLIs,
SURVEY.md 2.10). The same two backends are exposed behind one interface:

* DashScopePromptExpander — remote API (requires network + dashscope key;
  unavailable in an air-gapped deployment, raises a clear error).
* LocalPromptExpander — any locally served chat model via a user-supplied
  `generate_fn(system, user) -> str` (e.g. a Qwen checkpoint behind
  transformers); we do not bundle model weights.

System prompts mirror the reference's zh/en templates in intent: enrich the
prompt with subject details, motion, lighting and camera language while
preserving the user's meaning.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

EN_SYSTEM_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Rewrite the "
    "user's prompt into a rich, concrete description: keep the original "
    "subject and intent, add visual details (appearance, scene, lighting), "
    "explicit motion descriptions, and camera language. Output only the "
    "rewritten prompt, under 120 words."
)

ZH_SYSTEM_PROMPT = (
    "你是一个视频生成模型的提示词工程师。请将用户的提示词改写得更丰富具体："
    "保留原始主体和意图，补充外观、场景、光线等视觉细节，明确的运动描述和"
    "镜头语言。只输出改写后的提示词，不超过120字。"
)


@dataclasses.dataclass
class PromptOutput:
    status: bool
    prompt: str
    seed: int = -1
    system_prompt: str = ""
    message: str = ""


class PromptExpander:
    def __init__(self, is_zh: bool = False):
        self.system_prompt = ZH_SYSTEM_PROMPT if is_zh else EN_SYSTEM_PROMPT

    def __call__(self, prompt: str, seed: int = -1) -> PromptOutput:
        raise NotImplementedError


class LocalPromptExpander(PromptExpander):
    """Wraps any local generate_fn(system_prompt, user_prompt) -> str."""

    def __init__(self, generate_fn: Callable[[str, str], str],
                 is_zh: bool = False):
        super().__init__(is_zh)
        self.generate_fn = generate_fn

    def __call__(self, prompt: str, seed: int = -1) -> PromptOutput:
        try:
            out = self.generate_fn(self.system_prompt, prompt)
            return PromptOutput(True, out.strip(), seed, self.system_prompt)
        except Exception as e:  # noqa: BLE001
            return PromptOutput(False, prompt, seed, self.system_prompt,
                                message=str(e))


class DashScopePromptExpander(PromptExpander):
    """Remote DashScope API (reference prompt_extend.py:157)."""

    def __init__(self, api_key: Optional[str] = None, model: str = "qwen-plus",
                 is_zh: bool = False):
        super().__init__(is_zh)
        self.api_key = api_key
        self.model = model

    def __call__(self, prompt: str, seed: int = -1) -> PromptOutput:
        try:
            import dashscope  # noqa: F401
        except ImportError:
            return PromptOutput(
                False, prompt, seed, self.system_prompt,
                message="dashscope not installed / no network in this "
                        "deployment; use LocalPromptExpander",
            )
        import dashscope

        dashscope.api_key = self.api_key
        rsp = dashscope.Generation.call(
            self.model,
            messages=[
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": prompt},
            ],
            seed=seed if seed >= 0 else None,
            result_format="message",
        )
        if rsp.status_code == 200:
            return PromptOutput(
                True, rsp.output.choices[0].message.content.strip(),
                seed, self.system_prompt,
            )
        return PromptOutput(False, prompt, seed, self.system_prompt,
                            message=str(rsp))
