from leann_tpu.agent.react import ReActAgent, parse_action, Action

__all__ = ["ReActAgent", "parse_action", "Action"]
