from .payload import join_payload, nullable_pair

__all__ = ["join_payload", "nullable_pair"]
