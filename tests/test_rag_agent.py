import numpy as np
import pytest

from leann_tpu.agent.react import ReActAgent, parse_action
from leann_tpu.embed import EmbeddingProvider
from leann_tpu.index.builder import IndexBuilder
from leann_tpu.index.searcher import IndexSearcher
from leann_tpu.llm import LlmProvider
from leann_tpu.rag.ask import AskSession, build_prompt


@pytest.fixture()
def tiny_index(tmp_index_base):
    provider = EmbeddingProvider(mode="fake", dimensions=16)
    texts = [
        "the capital of France is Paris",
        "TPUs have a systolic matrix unit",
        "BM25 is a ranking function",
    ]
    builder = IndexBuilder(tmp_index_base, dim=16)
    for i, (t, v) in enumerate(zip(texts, provider.embed(texts))):
        builder.add(f"t{i}", t, v)
    builder.build()
    return IndexSearcher.load(tmp_index_base), provider


def test_parse_action_search():
    a = parse_action("Thought: hmm\nAction: search(vector databases)")
    assert a.kind == "search" and a.arg == "vector databases"


def test_parse_action_finish_multiline():
    a = parse_action("Thought: done\nAction: finish(The answer\nis 42.)")
    assert a.kind == "finish"
    assert "42" in a.arg


def test_parse_action_missing_close_paren():
    a = parse_action("Action: finish(no close paren")
    assert a.kind == "finish" and a.arg == "no close paren"


def test_parse_action_none():
    assert parse_action("I refuse to follow the format") is None


def test_simulated_llm_modes():
    llm = LlmProvider(mode="simulated")
    assert "simulated" in llm.generate("Question: x\nContext: y").lower()
    out = llm.generate("Thought: ...\nAction: ...")
    assert "Action:" in out


def test_ask_session(tiny_index):
    searcher, provider = tiny_index
    session = AskSession(searcher, provider, LlmProvider(mode="simulated"), top_k=2)
    result = session.ask("What is the capital of France?")
    assert result.answer
    assert len(result.sources) == 2
    assert result.sources[0].id == "t0"  # same-text similarity wins


def test_build_prompt_numbers_passages(tiny_index):
    searcher, provider = tiny_index
    session = AskSession(searcher, provider, LlmProvider(mode="simulated"))
    passages = session.retrieve("TPUs have a systolic matrix unit")
    prompt = build_prompt("what is a TPU?", passages)
    assert "[1]" in prompt
    assert "Question: what is a TPU?" in prompt


def test_react_agent_completes(tiny_index):
    searcher, provider = tiny_index
    agent = ReActAgent(
        searcher, provider, LlmProvider(mode="simulated"), max_steps=4
    )
    answer, steps = agent.run("what ranks documents?")
    assert answer  # simulated LLM finishes after one observation
    assert len(steps) >= 2
    assert steps[0].observation  # first step searched and observed


def test_react_agent_search_observation_contains_snippets(tiny_index):
    searcher, provider = tiny_index
    agent = ReActAgent(searcher, provider, LlmProvider(mode="simulated"), top_k=2)
    obs = agent.execute_search("BM25 is a ranking function")
    assert "[1]" in obs and "(t2)" in obs
