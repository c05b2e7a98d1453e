from leann_tpu.rag.ask import AskSession, build_prompt

__all__ = ["AskSession", "build_prompt"]
