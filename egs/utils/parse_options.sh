# Parse --option value command-line arguments into shell variables.
#
# Same contract as the Kaldi-style parse_options.sh the reference recipes
# source (`wavenet_vocoder/utils/parse_options.sh`): for each
# "--some-option value" pair, sets shell variable some_option=value, but
# only if that variable was already declared in the script (typo guard).
# "--config <file>" sources the file first.  Must be sourced, not run.

# handle --config first so explicit flags override it
config_file=
_args=("$@")
for ((_i=0; _i<${#_args[@]}; _i++)); do
    if [ "${_args[$_i]}" == "--config" ]; then
        config_file="${_args[$((_i+1))]}"
    fi
done
if [ -n "$config_file" ]; then
    if [ ! -r "$config_file" ]; then
        echo "parse_options.sh: cannot read config file $config_file" 1>&2
        exit 1
    fi
    . "$config_file"
fi

while true; do
    [ -z "${1:-}" ] && break
    case "$1" in
        --help|-h)
            if [ -z "${help_message:-}" ]; then
                echo "No help found." 1>&2
            else
                printf "%s\n" "$help_message" 1>&2
            fi
            exit 0
            ;;
        --*=*)
            echo "$0: options must be specified as '--name value', got '$1'" 1>&2
            exit 1
            ;;
        --config)
            shift 2  # already handled above
            ;;
        --*)
            _name=$(echo "$1" | sed 's/^--//' | tr '-' '_')
            # the variable must already exist (catches option typos)
            eval '[ -z "${'"$_name"'+xxx}" ]' && {
                echo "$0: invalid option $1" 1>&2
                exit 1
            }
            _oldval="$(eval echo \$"$_name")"
            if [ "$_oldval" == "true" ] || [ "$_oldval" == "false" ]; then
                if [ "$2" != "true" ] && [ "$2" != "false" ]; then
                    echo "$0: option $1 must be true or false, got $2" 1>&2
                    exit 1
                fi
            fi
            eval "$_name=\"\$2\""
            shift 2
            ;;
        *)
            break
            ;;
    esac
done

# check for an odd number of leftover --opt without value
true
