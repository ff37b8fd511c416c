"""The two hooks modern protoc gencode calls to materialize a module:

  _builder.BuildMessageAndEnumDescriptors(DESCRIPTOR, globals())
      -> inserts descriptor objects under ``_UPPERCASED`` keys
         (nested types as ``_PARENT_CHILD``)
  _builder.BuildTopDescriptorsAndMessages(DESCRIPTOR, module_name,
                                          globals())
      -> inserts concrete message classes under their proto names,
         enum wrappers under enum names, and module-level constants for
         file-level enum values
"""

from __future__ import annotations

from .. import message as _message
from .enum_type_wrapper import EnumTypeWrapper


def _walk_messages(file_des):
    """Yield (descriptor, key_path) depth-first; key_path is the list of
    message names from top level down to this descriptor."""
    stack = [(m, [m.name]) for m in file_des.message_types_by_name.values()]
    while stack:
        des, path = stack.pop(0)
        yield des, path
        for nt in des.nested_types:
            stack.append((nt, path + [nt.name]))


def BuildMessageAndEnumDescriptors(file_des, module_globals):  # noqa: N802
    for des, path in _walk_messages(file_des):
        module_globals["_" + "_".join(p.upper() for p in path)] = des
        for et in des.enum_types:
            module_globals[
                "_" + "_".join(p.upper() for p in path) + "_" + et.name.upper()
            ] = et
    for et in file_des.enum_types_by_name.values():
        module_globals["_" + et.name.upper()] = et


def _build_class(des, module_name):
    if des._concrete_class is not None:
        return des._concrete_class
    attrs = {"DESCRIPTOR": des, "__module__": module_name}
    cls = type(des.name, (_message.Message,), attrs)
    des._concrete_class = cls
    # nested messages / enums become attributes of the containing class
    for nt in des.nested_types:
        setattr(cls, nt.name, _build_class(nt, module_name))
    for et in des.enum_types:
        setattr(cls, et.name, EnumTypeWrapper(et))
        for v in et.values:
            setattr(cls, v.name, v.number)
    return cls


def BuildTopDescriptorsAndMessages(  # noqa: N802
    file_des, module_name, module_globals
):
    from .. import symbol_database as _symbol_database

    sym_db = _symbol_database.Default()
    for des in file_des.message_types_by_name.values():
        cls = _build_class(des, module_name)
        module_globals[des.name] = cls
        sym_db.RegisterMessage(cls)
    for et in file_des.enum_types_by_name.values():
        module_globals[et.name] = EnumTypeWrapper(et)
        # file-level enum values are module-level constants in gencode
        for v in et.values:
            module_globals[v.name] = v.number
