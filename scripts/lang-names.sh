# Shared language-name table for the Debian variant builders
# (build-debian-lang.sh / build-debian-voice.sh source this).  Unknown
# codes ERROR: both packages embed the name in user-visible control
# fields, and a silent fallback would ship a raw code as the human name.
lang_name() {
  case "$1" in
    de-de) echo German ;;
    en-us) echo "U.S. English" ;;
    es-es) echo Spanish ;;
    fr-fr) echo French ;;
    it-it) echo Italian ;;
    nl) echo Dutch ;;
    ru-ru) echo Russian ;;
    sv-se) echo Swedish ;;
    sw) echo Swahili ;;
    *) echo "no language name for $1" >&2; return 1 ;;
  esac
}
