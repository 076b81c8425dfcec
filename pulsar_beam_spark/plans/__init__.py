from .explain import explain_summary, formatted_plan, simple_plan, n_exchanges, has_pushed_filters, has_broadcast  # noqa: F401
