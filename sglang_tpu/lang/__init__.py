"""The sgl frontend DSL (reference `python/sglang/lang/`, SURVEY §2 F1).

Imperative subset of the SGLang language: `@function` programs over a
mutable `ProgramState`, `gen()` / `select()` primitives, chat roles, and
`fork()` for branching — executed against an in-process `Engine` or a
remote HTTP endpoint.

    import sglang_tpu.lang as sgl

    @sgl.function
    def qa(s, question):
        s += sgl.system("You are terse.")
        s += sgl.user(question)
        s += sgl.assistant(sgl.gen("answer", max_tokens=64))

    state = qa.run(question="2+2?", backend=sgl.EngineBackend(engine))
    print(state["answer"])
"""

from sglang_tpu.lang.api import (
    EngineBackend,
    ProgramState,
    RuntimeEndpoint,
    assistant,
    function,
    gen,
    select,
    system,
    user,
)

__all__ = [
    "EngineBackend",
    "ProgramState",
    "RuntimeEndpoint",
    "assistant",
    "function",
    "gen",
    "select",
    "system",
    "user",
]
