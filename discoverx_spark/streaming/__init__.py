from .pipeline_stream import (decide_stream, run_stream_once,
                              windowed_keep_metrics,
                              conversation_state_stream, dedup_stream,
                              minhash_signatures_stream,
                              conversation_gates_stream,
                              keyword_gate_stream,
                              tool_call_stats_stream)

__all__ = ["decide_stream", "run_stream_once", "windowed_keep_metrics",
           "conversation_state_stream", "dedup_stream",
           "minhash_signatures_stream", "conversation_gates_stream",
           "keyword_gate_stream", "tool_call_stats_stream"]
