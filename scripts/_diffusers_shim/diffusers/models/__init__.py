# shim subpackage
