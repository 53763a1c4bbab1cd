from .tuning import prep_session, explain_str

__all__ = ["prep_session", "explain_str"]
